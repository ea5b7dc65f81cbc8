package graft.sample

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic WEIGHTED INTERLEAVE — the stream-merge a training-data
  * loader performs: given per-source mixing weights (from [[Mixture]]),
  * emit documents so that every prefix of the output contains each source
  * in proportion to its weight, reproducibly.
  *
  * Classic deterministic stratified merge: the r-th document of source s
  * gets key (r - 0.5) / w_s — source positions spread evenly over the
  * unit timeline at density w_s — and the output order is ascending key.
  * A source with twice the weight appears twice as often in every window
  * of the output, and the schedule is a pure function of (weights, ids):
  * re-runs are byte-identical, unlike an RNG-drawn mixture.
  *
  * Scale shape: the per-source sequence number comes from
  * [[GroupedRank.rank]] (range partition on (source, tie) +
  * per-partition row_number + driver offsets — NEVER a single task per
  * source; with ~16 sources a plain grouped window would sort corpus/16
  * rows in one task), then a broadcast join against the |sources|-row
  * weight table, then the scalable global-rank machinery of
  * [[EpochShuffle.rank]] over the interleave key.
  */
object Interleave {

  /** Adds `interleave_rank` (dense, 1-based): the position of each row in
    * the weighted merge order. `weights` needs columns (group, weight) as
    * produced by [[Mixture.weights]]; rows of `df` whose source is absent
    * from `weights` are dropped (they have no mixing mass). `tie` must be
    * row-unique and orders rows WITHIN a source. */
  def byWeight(
      spark: SparkSession,
      df: DataFrame,
      source: Column,
      tie: Column,
      weights: DataFrame,
      numPartitions: Int = 0
  ): DataFrame = {
    // the joined mixture weight rides under the reserved "_w" alias so an
    // input that already has its own "weight" column stays unambiguous
    val keyed = GroupedRank
      .rank(spark, df, source, Seq(tie), numPartitions)
      .withColumnRenamed("group_rank", "_rn_src")
      .drop("group_count")
      .join(
        broadcast(weights.select(col("group").as("_grp"), col("weight").as("_w"))),
        source === col("_grp"))
      .where(col("_w") > 0)
      .withColumn(
        "_ikey",
        (col("_rn_src").cast("double") - lit(0.5)) / col("_w"))
      .drop("_grp", "_w", "_rn_src")

    EpochShuffle
      .rank(spark, keyed, col("_ikey"), tie, numPartitions)
      .withColumnRenamed("shuffle_rank", "interleave_rank")
      .drop("_ikey")
  }
}
