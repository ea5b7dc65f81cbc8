package graft.run

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recommended session wiring and partitioning helpers. */
object GraftSession {

  /** Builder with the engine's recommended conf: AQE on (incl. skew-join
    * splitting for the label-compare / enrichment joins against
    * mega-conversations), shuffle partitions sized to the core count for
    * local runs (cluster deployments should size to 2-3x total cores), and
    * the graft SQL functions registered. */
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  /** Handle to a running cancellable job group. */
  final class JobGroupHandle(
      spark: SparkSession,
      val groupId: String,
      runner: Thread,
      cancelledFlag: java.util.concurrent.atomic.AtomicBoolean) {
    /** Cancel the run: flags not-yet-submitted work (cancelJobGroup only
      * reaches ACTIVE jobs — an early cancel would otherwise be a silent
      * no-op and the body would run to completion on the cluster's dime),
      * cancels the group's running jobs, and interrupts the runner thread
      * so multi-action bodies stop between jobs too. */
    def cancel(reason: String = "user requested"): Unit = {
      cancelledFlag.set(true)
      spark.sparkContext.cancelJobGroup(groupId, reason)
      runner.interrupt()
    }
    def cancelled: Boolean = cancelledFlag.get
    /** Job ids the group has started (poll to know the job is live). */
    def activeJobIds: Seq[Int] =
      spark.sparkContext.statusTracker.getJobIdsForGroup(groupId).toSeq
  }

  final case class CancellableRun[T](
      handle: JobGroupHandle,
      result: scala.concurrent.Future[T])

  /** Cooperative cancellation — the operational story for a 100-TB job.
    * The reference checks a cancel flag per record
    * (src/CorpusAid.py:766-771,1644-1648); Spark's unit of cooperative
    * cancellation is the JOB GROUP: `body`'s actions run on a dedicated
    * thread under a fresh group id with interruptOnCancel=true, and
    * [[JobGroupHandle.cancel]] interrupts all of the group's running tasks
    * mid-record. The returned future fails with a SparkException naming the
    * cancelled group. */
  def runCancellable[T](spark: SparkSession, name: String)(body: => T): CancellableRun[T] = {
    val groupId = s"graft-$name-${java.util.UUID.randomUUID().toString.take(8)}"
    val p = scala.concurrent.Promise[T]()
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      spark.sparkContext.setJobGroup(groupId, s"graft cancellable: $name",
        interruptOnCancel = true)
      try {
        if (cancelled.get)
          throw new java.util.concurrent.CancellationException(
            s"group $groupId cancelled before the first job was submitted")
        p.success(body)
      }
      catch {
        case e: Throwable =>
          // normalize post-cancel failures (thread interrupt surfaces as a
          // bare InterruptedException) so callers always see "cancelled"
          p.failure(
            if (cancelled.get && !e.toString.toLowerCase.contains("cancel"))
              new java.util.concurrent.CancellationException(
                s"group $groupId cancelled (${e.getClass.getSimpleName})")
            else e)
      }
      finally spark.sparkContext.clearJobGroup()
    }, s"graft-run-$name")
    t.setDaemon(true)
    val handle = new JobGroupHandle(spark, groupId, t, cancelled)
    t.start()
    CancellableRun(handle, p.future)
  }

  /** Salted repartition for embarrassingly-parallel per-row stages over a
    * skewed key: `pmod(xxhash64(key, salt), parts)` spreads a
    * mega-conversation across `saltFactor` partitions. NOT for the window
    * stage (cross-turn rules need all of a conversation's rows together —
    * the bounded-frame window is linear in partition size, so skew there
    * costs time, not memory). */
  def saltedRepartition(
      df: DataFrame,
      key: Column,
      parts: Int,
      saltFactor: Int = 8
  ): DataFrame = {
    // the salt must be DETERMINISTIC per row content: a salt derived from
    // monotonically_increasing_id changes on stage retry (the recomputed
    // partition re-numbers rows), re-routing rows to different reducers
    // than the first attempt already committed — the SPARK-23207 silent
    // duplicate/loss class. Hashing the full row is stable across retries.
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
      lit(saltFactor))
    df.repartition(parts, key, salt)
  }

  /** Partition-size histogram — the skew diagnostic used in tests. */
  def partitionSizes(df: DataFrame): Seq[Long] = {
    import df.sparkSession.implicits._
    df.groupBy(spark_partition_id().as("pid"))
      .count().as[(Int, Long)].collect().map(_._2).toSeq
  }
}
