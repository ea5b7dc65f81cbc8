package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Aggregator

/** Materialization ("pinning") policy for multi-job operators.
  *
  * The rank/prefix-sum machinery ([[graft.sample.EpochShuffle]],
  * [[graft.sample.GroupedRank]], and their Pack/Interleave/capstone callers)
  * must freeze a `repartitionByRange` stage so that every later job observes
  * the SAME partition assignment (range boundaries are re-sampled per
  * execution — re-evaluating the lazy exchange could put boundary rows in a
  * different partition than the one their offsets were computed on).
  *
  * Two pinning modes:
  *
  *   - default: `localCheckpoint(eager = true)` — zero-copy executor-local
  *     blocks. Fastest, but the blocks have NO recompute path: an executor
  *     lost between the offsets job and the final join aborts the query.
  *     Right for local mode and gang-scheduled clusters.
  *   - `spark.graft.checkpointDir` set (e.g. to an HDFS/s3a path): reliable
  *     `checkpoint(eager = true)` — the stage is written to the fault-tolerant
  *     FS and any lost partition is re-read instead of aborting. The mode for
  *     100-TB clusters with preemptible executors, at the cost of one DFS
  *     round-trip. Set `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  *     to garbage-collect checkpoint files with their DataFrames.
  *
  * The conf is read per call, so one session can switch modes between
  * queries (tests pin it per-mode and assert rank equality).
  */
object Materialize {

  val ConfKey = "spark.graft.checkpointDir"

  /** Pinned RDDs per context, in pin order. localCheckpoint blocks are only
    * reclaimed when the driver GCs the DataFrame AND the async
    * ContextCleaner runs — in a long session that pins per-query stages
    * (the bench battery, a multi-epoch production run) the lag stacks
    * gigabytes of dead blocks in the block manager and later queries pay
    * for it in eviction/GC (q94-q96 measured 3-8x slower late in the
    * battery than in isolation). [[releaseAll]] makes the lifecycle
    * explicit: harnesses call it at query boundaries, after the consumer's
    * action has completed. Weak keys so a stopped context frees its list. */
  private val livePins =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext,
        java.util.ArrayList[org.apache.spark.rdd.RDD[_]]]())

  /** Unpersist every pin taken on `spark`'s context since the last release.
    * Call ONLY at a point where no DataFrame returned by [[pin]] (or built
    * on top of one) will execute again — a localCheckpointed stage has no
    * recompute path, so a released pin that is re-read fails loudly.
    * Returns the number of pins released. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Int = {
    // snapshot under the same monitor track() appends under — iterating the
    // live ArrayList outside it raced a concurrent pin() on multi-threaded
    // drivers (ADVICE r5: ConcurrentModificationException / missed
    // unpersist)
    val snapshot = livePins.synchronized {
      val l = livePins.remove(spark.sparkContext)
      if (l == null) Nil
      else scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toList
    }
    var n = 0
    snapshot.foreach { rdd =>
      try { rdd.unpersist(blocking = false); n += 1 }
      catch { case _: Throwable => () }
    }
    n
  }

  private def track(sc: org.apache.spark.SparkContext, df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        livePins.synchronized {
          var l = livePins.get(sc)
          if (l == null) {
            l = new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]()
            livePins.put(sc, l)
          }
          l.add(lr.rdd)
        }
      case _ => () // unexpected plan shape: skip tracking, never fail a pin
    }

  /** The base dir last passed to `setCheckpointDir` per context. Comparing
    * against this (not against `getCheckpointDir`, which is base + a
    * per-call UUID subdir) makes the staleness check exact: a substring
    * test would false-positive when the new base is a substring of the old
    * one (e.g. /data/ckpt-a -> /data/ckpt) and keep writing under the
    * stale base. Weak keys so a stopped context doesn't pin its entry. */
  private val lastBase =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Materialize `df` under the session's pinning policy (see object doc).
    *
    * LIFECYCLE CONTRACT (ADVICE r5): every pin taken here is released by
    * the next [[releaseAll]] — harnesses call that at query boundaries.
    * A long-lived/memoized DataFrame (session-staged inputs, cross-query
    * memos) must therefore NEVER go through pin(): build it with a direct
    * `localCheckpoint(true)` (as [[graft.SparkEntry]]'s `staged` does) so
    * the position-blind drain cannot destroy it mid-session. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)
    val out = dir match {
      case Some(d) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a per-call UUID subdir — only (re)set when
        // the configured base changed, or every pin would open a new subdir
        if (sc.getCheckpointDir.isEmpty || lastBase.get(sc) != d) {
          sc.setCheckpointDir(d)
          lastBase.put(sc, d)
        }
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
    track(spark.sparkContext, out)
    out
  }

  /** Input row for [[SumByKey]]: an opaque string key and a weight. */
  final case class KeyedWeight(k: String, w: Long)

  /** Map-typed sum-by-key aggregate for `observe()` — lets a single
    * materialization job carry per-(partition, group) row counts or weight
    * sums as a CollectMetrics side channel instead of paying a second
    * traversal of the pinned stage. Buffer size is |distinct keys seen by
    * the task| — for the rank machinery that is bounded by |partitions| +
    * |groups| (group runs are contiguous under range partitioning), never
    * by row count. */
  object SumByKey extends Aggregator[KeyedWeight, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], r: KeyedWeight): Map[String, Long] =
      m.updated(r.k, m.getOrElse(r.k, 0L) + r.w)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
