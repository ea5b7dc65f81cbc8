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
