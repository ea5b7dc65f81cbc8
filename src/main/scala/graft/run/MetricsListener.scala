package graft.run

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Collects the pipeline's `Dataset.observe("graft_metrics", …)` rows —
  * the Spark-native replacement for the reference's progress/throughput
  * signals (files done, bytes/sec, ETA: src/CorpusAid.py:762-793,2447-2464).
  *
  * Usage:
  *   val l = MetricsListener.install(spark)
  *   … run jobs …
  *   l.snapshots  // Seq[RunMetrics]
  */
final class MetricsListener extends QueryExecutionListener {

  final case class RunMetrics(turns: Long, kept: Long, bytesIn: Long, wallNs: Long) {
    def turnsPerSec: Double = turns / (wallNs / 1e9)
    def bytesPerSec: Double = bytesIn / (wallNs / 1e9)
    def keepRate: Double = if (turns == 0) 0.0 else kept.toDouble / turns
  }

  private val acc = new ConcurrentLinkedQueue[RunMetrics]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val metrics = qe.observedMetrics.get("graft_metrics")
    metrics.foreach { row =>
      // sum() observes NULL over zero rows / all-null inputs — getLong
      // would NPE and the listener bus swallows it, silently losing the
      // snapshot for exactly the degenerate runs that need the signal
      def lng(name: String): Long = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) 0L else row.getLong(i)
      }
      acc.add(RunMetrics(
        turns = lng("turns"),
        kept = lng("kept"),
        bytesIn = lng("bytes_in"),
        wallNs = durationNs))
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()

  def snapshots: Seq[RunMetrics] = acc.asScala.toSeq

  def clear(): Unit = acc.clear()
}

object MetricsListener {
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
