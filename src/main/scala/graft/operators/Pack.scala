package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-budget bins (context
  * windows) by contiguous fill — the pretraining step that concatenates
  * documents into training sequences of ~budget tokens.
  *
  * Policy = ORDERED OFFSET PACKING: within each partition group, documents
  * are laid out end-to-end in `orderCol` order and a document belongs to the
  * bin where its first token lands (`floor(cumulative_weight_before /
  * budget)`). This is deterministic, order-stable, and ANSI-SQL-expressible
  * (one window running sum), unlike best-fit bin packing which is
  * inherently sequential and non-reproducible under re-partitioning.
  *
  * Scale shape: ONE window shuffle partitioned by `groupCols` — packing
  * parallelism equals the number of groups (source shards, date buckets…).
  * A 100-TB run packs per (source, shard) so no single window sees more
  * than a shard's rows; the group key is the natural write-partition key so
  * the shuffle doubles as the layout for the sink.
  */
object Pack {

  /** Adds `bin` (0-based within group) to each row.
    *
    * @param weightCol token/byte count column used to fill the budget
    * @param tieCols appended to the ordering — (orderCol ++ tieCols) must
    *   be UNIQUE within each group, or the running sum (and therefore bin
    *   assignment) depends on arbitrary intra-tie row order and re-runs
    *   are not reproducible
    */
  def contiguous(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      budget: Long,
      tieCols: Seq[String] = Nil
  ): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(!df.columns.contains("bin") && !df.columns.contains("__cum"),
      "input already has a 'bin'/'__cum' column — rename it before packing")
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("bin", floor((col("__cum") - col(weightCol)) / budget))
      .drop("__cum")
  }

  /** [[contiguous]] with the SCALABLE prefix sum: identical bin assignment,
    * but the running sum comes from [[graft.sample.GroupedRank.prefixSum]]
    * (range partition + per-partition window + driver offsets) instead of
    * a whole-group single-task window — the shape a 100-TB corpus with a
    * handful of sources needs. Multi-column groups ride as a struct key
    * (range partitioning orders structs lexicographically). */
  def contiguousScalable(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      budget: Long,
      tieCols: Seq[String] = Nil,
      numPartitions: Int = 0
  ): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(!df.columns.contains("bin") && !df.columns.contains("group_prefix_sum"),
      "input already has a 'bin'/'group_prefix_sum' column — rename it before packing")
    // the prefix sum is integral (cast to long): a fractional weight would
    // silently diverge from contiguous() (truncated sum minus raw weight)
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$weightCol: integral weight required for the scalable pack, got $dt " +
          "(token/byte counts); pre-round or use contiguous()")
    }
    val groupKey =
      if (groupCols.size == 1) col(groupCols.head)
      else struct(groupCols.map(col): _*)
    graft.sample.GroupedRank
      .prefixSum(spark, df, groupKey, (orderCol +: tieCols).map(col),
        col(weightCol), numPartitions)
      .withColumn("bin",
        floor((col("group_prefix_sum") - col(weightCol)) / budget))
      .drop("group_prefix_sum")
  }

  /** Per-bin summary (n_docs, total weight) — the packing manifest. */
  def manifest(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      budget: Long
  ): DataFrame =
    contiguous(df, groupCols, orderCol, weightCol, budget)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("sum_weight"))

  /** [[manifest]] over the scalable variant. */
  def manifestScalable(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      budget: Long
  ): DataFrame =
    contiguousScalable(spark, df, groupCols, orderCol, weightCol, budget)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("sum_weight"))
}
