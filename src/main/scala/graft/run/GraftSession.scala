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
  final case class JobGroupHandle(spark: SparkSession, groupId: String) {
    /** Cancel every job in the group; running tasks are interrupted. */
    def cancel(reason: String = "user requested"): Unit =
      spark.sparkContext.cancelJobGroup(groupId)
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
    val t = new Thread(() => {
      spark.sparkContext.setJobGroup(groupId, s"graft cancellable: $name",
        interruptOnCancel = true)
      try p.success(body)
      catch { case e: Throwable => p.failure(e) }
      finally spark.sparkContext.clearJobGroup()
    }, s"graft-run-$name")
    t.setDaemon(true)
    t.start()
    CancellableRun(JobGroupHandle(spark, groupId), p.future)
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
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
    df.repartition(parts, key, salt)
  }

  /** Partition-size histogram — the skew diagnostic used in tests. */
  def partitionSizes(df: DataFrame): Seq[Long] = {
    import df.sparkSession.implicits._
    df.groupBy(spark_partition_id().as("pid"))
      .count().as[(Int, Long)].collect().map(_._2).toSeq
  }
}
