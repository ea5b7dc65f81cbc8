package graft.sample

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scalable PER-GROUP sequence ranking — `row_number() OVER (PARTITION BY
  * group ORDER BY ...)` without the single-task-per-group collapse.
  *
  * A plain grouped window hash-partitions on the group key: with ~16
  * sources over a 100-TB corpus each task sorts corpus/16 rows (TBs per
  * task). This is the [[EpochShuffle.rank]] zipWithIndex machinery
  * generalized to groups:
  *
  *   1. range-repartition on (group, order...) — the global sort order maps
  *      to ascending partition ids, and rows of one group occupy a
  *      contiguous pid range, each task holding only its own slice;
  *   2. `row_number` windowed by (partition id, group) — per-task sorts;
  *   3. per-(pid, group) row counts (≤ |partitions| + |groups| rows,
  *      because group runs are contiguous) collect to the driver, turn
  *      into per-(pid, group) cumulative offsets + per-group totals, and
  *      broadcast-join back: rank = offset(pid, g) + local row_number.
  *
  * The keyed stage is materialized (localCheckpoint) for the same reason as
  * [[EpochShuffle.rank]]: `repartitionByRange` samples boundaries per
  * execution, and the offsets job and the final join must observe the SAME
  * partition assignment.
  */
object GroupedRank {

  private val tempCols = Set(
    "_ggrp", "_gpid", "_grn", "_gw", "_gcum", "_gopid", "_gogrp", "_goff", "_gtot")

  /** Fail fast instead of silently clobbering/dropping an input column that
    * collides with the machinery's temp names. */
  private def requireNoTempCols(df: DataFrame): Unit = {
    val clash = df.columns.filter(tempCols)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with GroupedRank " +
        "internals — rename them first")
  }

  /** The pre-materialization range-partitioned stage — separate so the plan
    * audit can assert the range exchange that [[rank]]'s localCheckpoint
    * hides behind a Scan ExistingRDD. */
  private[graft] def keyedStage(
      df: DataFrame, group: Column, order: Seq[Column], p: Int): DataFrame =
    df.withColumn("_ggrp", group)
      .repartitionByRange(p, col("_ggrp") +: order: _*)
      .withColumn("_gpid", spark_partition_id())

  /** `df` plus `group_rank` (dense 1-based position of the row within its
    * group under ascending `order`) and `group_count` (total rows in the
    * group). `order` must be row-unique WITHIN a group (append a tie
    * column) for a total, reproducible order; sort direction modifiers
    * (`.desc`) are honored. Null group values form their own group. */
  def rank(
      spark: SparkSession,
      df: DataFrame,
      group: Column,
      order: Seq[Column],
      numPartitions: Int = 0
  ): DataFrame = {
    require(order.nonEmpty, "order columns required")
    requireNoTempCols(df)
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val keyed = keyedStage(df, group, order, p).localCheckpoint(true)

    val local = keyed.withColumn(
      "_grn",
      row_number().over(
        Window.partitionBy(col("_gpid"), col("_ggrp")).orderBy(order: _*)))

    // ≤ |partitions| + |groups| rows (contiguous group runs): per-group
    // cumulative offsets + totals on the driver
    val counts = local.groupBy("_gpid", "_ggrp").count().collect()
    val byGroup = counts.groupBy(r => r.get(1))
    val offRows = new java.util.ArrayList[Row]()
    byGroup.foreach { case (g, rs) =>
      val sorted = rs.sortBy(_.getInt(0))
      val total = sorted.map(_.getLong(2)).sum
      var acc = 0L
      sorted.foreach { r =>
        offRows.add(Row(r.getInt(0), g, acc, total))
        acc += r.getLong(2)
      }
    }
    val grpField = keyed.schema("_ggrp")
    val offSchema = StructType(Seq(
      StructField("_gopid", IntegerType, nullable = false),
      grpField.copy(name = "_gogrp"),
      StructField("_goff", LongType, nullable = false),
      StructField("_gtot", LongType, nullable = false)))
    val offDf = spark.createDataFrame(offRows, offSchema)

    local
      .join(
        broadcast(offDf),
        col("_gpid") === col("_gopid") && col("_ggrp") <=> col("_gogrp"))
      .withColumn("group_rank", col("_goff") + col("_grn"))
      .withColumn("group_count", col("_gtot"))
      .drop("_ggrp", "_gpid", "_grn", "_gopid", "_gogrp", "_goff", "_gtot")
  }

  /** `df` plus `group_prefix_sum` — the INCLUSIVE running sum of `weight`
    * within the row's group under ascending `order` — computed with the
    * same range-partition + per-partition window + driver-offset machinery
    * as [[rank]] (offsets are per-(pid, group) weight sums instead of row
    * counts). This is what makes sequence packing scale-safe: the plain
    * `sum() OVER (PARTITION BY group ORDER BY ...)` sorts a whole group in
    * one task. `weight` is cast to long (token/byte counts — integral by
    * contract); `order` must be row-unique within a group. */
  def prefixSum(
      spark: SparkSession,
      df: DataFrame,
      group: Column,
      order: Seq[Column],
      weight: Column,
      numPartitions: Int = 0
  ): DataFrame = {
    require(order.nonEmpty, "order columns required")
    requireNoTempCols(df)
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val keyed = keyedStage(df.withColumn("_gw", weight.cast("long")),
      group, order, p).localCheckpoint(true)

    val w = Window.partitionBy(col("_gpid"), col("_ggrp"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("_gcum", sum(col("_gw")).over(w))

    val counts = keyed.groupBy("_gpid", "_ggrp")
      .agg(coalesce(sum(col("_gw")), lit(0L)).as("_gs")).collect()
    val byGroup = counts.groupBy(r => r.get(1))
    val offRows = new java.util.ArrayList[Row]()
    byGroup.foreach { case (g, rs) =>
      val sorted = rs.sortBy(_.getInt(0))
      var acc = 0L
      sorted.foreach { r =>
        offRows.add(Row(r.getInt(0), g, acc))
        acc += r.getLong(2)
      }
    }
    val grpField = keyed.schema("_ggrp")
    val offSchema = StructType(Seq(
      StructField("_gopid", IntegerType, nullable = false),
      grpField.copy(name = "_gogrp"),
      StructField("_goff", LongType, nullable = false)))
    val offDf = spark.createDataFrame(offRows, offSchema)

    local
      .join(
        broadcast(offDf),
        col("_gpid") === col("_gopid") && col("_ggrp") <=> col("_gogrp"))
      .withColumn("group_prefix_sum", col("_goff") + col("_gcum"))
      .drop("_ggrp", "_gpid", "_gw", "_gcum", "_gopid", "_gogrp", "_goff")
  }

  /** Exact `ntile(n)` from a (1-based) rank and the group total — the ANSI
    * contract (bucket sizes differ by at most 1, earlier buckets larger)
    * computed arithmetically so tiering composes with [[rank]] instead of
    * needing its own grouped window. All arithmetic is integral (`div`) —
    * no double rounding at any group size. */
  def ntileExpr(rank: Column, total: Column, n: Int): Column = {
    require(n >= 1, s"ntile n must be >= 1, got $n")
    val nL = lit(n.toLong)
    val rem = pmod(total, nL)
    val q = call_function("div", total - rem, nL)
    val cut = rem * (q + lit(1L)) // rows covered by the (q+1)-sized buckets
    when(rank <= cut,
      call_function("div", rank - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(
        // unreachable when q == 0 (then cut == total >= rank): guard anyway
        rem + call_function("div", rank - cut - lit(1L), greatest(q, lit(1L))) + lit(1L))
      .cast("int")
  }
}
