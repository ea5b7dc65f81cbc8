package graft.sample

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.run.Materialize

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
  *      because group runs are contiguous) reach the driver, turn into
  *      per-(pid, group) cumulative offsets + per-group totals, and
  *      broadcast-join back: rank = offset(pid, g) + local row_number.
  *
  * The keyed stage is pinned ([[Materialize.pin]] — localCheckpoint, or a
  * reliable checkpoint when `spark.graft.checkpointDir` is set) for the same
  * reason as [[EpochShuffle.rank]]: `repartitionByRange` samples boundaries
  * per execution, and the offsets and the final join must observe the SAME
  * partition assignment.
  *
  * SINGLE-PASS offsets: for group-key types whose `to_json` rendering is
  * injective and equality-consistent ([[jsonStableKey]] — strings, integral
  * types, and structs/arrays thereof), the per-(pid, group) counts ride the
  * pinning job itself as an `observe()` map aggregate, so the machinery
  * makes exactly ONE pass over the keyed data before the final join. Other
  * types (float/double: -0.0 vs 0.0 group as equal but render differently;
  * timestamps: JSON truncates to millis, merging distinct micros) fall back
  * to an explicit counts job over the pinned blocks — same results, one
  * extra (cheap, checkpoint-local) traversal.
  */
object GroupedRank {

  private val tempCols = Set(
    "_ggrp", "_ggs", "_gpid", "_grn", "_gw", "_gcum",
    "_gopid", "_gogrp", "_gogs", "_goff", "_gtot")

  private val rankOutputCols = Set("group_rank", "group_count")
  private val prefixOutputCols = Set("group_prefix_sum")

  /** Fail fast instead of silently clobbering/dropping an input column that
    * collides with the machinery's temp or output names. */
  private def requireNoClash(df: DataFrame, outputCols: Set[String]): Unit = {
    val clash = df.columns.filter(tempCols)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with GroupedRank " +
        "internals — rename them first")
    val outClash = df.columns.filter(outputCols)
    require(outClash.isEmpty,
      s"input columns ${outClash.mkString(", ")} collide with GroupedRank " +
        "output columns — rename them first")
  }

  /** Group-key types whose `to_json` string is a safe join surrogate: the
    * rendering must be injective AND agree with Spark's grouping equality.
    * Floats (-0.0 == 0.0 under grouping, distinct JSON) and timestamps
    * (JSON truncates micros to millis) fail one of the two. */
  private[graft] def jsonStableKey(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | DateType | BinaryType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case s: StructType => s.fields.forall(f => jsonStableKey(f.dataType))
    case a: ArrayType => jsonStableKey(a.elementType)
    case _ => false
  }

  /** The pre-materialization range-partitioned stage — separate so the plan
    * audit can assert the range exchange that [[rank]]'s pinning hides
    * behind a Scan ExistingRDD. */
  private[graft] def keyedStage(
      df: DataFrame, group: Column, order: Seq[Column], p: Int): DataFrame =
    df.withColumn("_ggrp", group)
      .repartitionByRange(p, col("_ggrp") +: order: _*)
      .withColumn("_gpid", spark_partition_id())

  /** Parse `pid|json` map keys from the observe aggregate back into
    * (pid, group-json) — pid never contains '|'. */
  private def parseKey(k: String): (Int, String) = {
    val i = k.indexOf('|')
    (k.substring(0, i).toInt, k.substring(i + 1))
  }

  /** Driver-side group-key wrapper for the fallback path: Scala's `==` on
    * boxed Doubles is NUMERIC equality (NaN != NaN), so a plain `groupBy`
    * would split the NaN group that Spark's grouping (which treats NaN as
    * equal) returned as one. `equals`-based identity (java.lang.Double:
    * NaN == NaN true) matches Spark's post-normalization semantics; Rows/
    * Seqs compare element-wise so struct/array keys work too. -0.0 never
    * reaches the driver (Spark normalizes it to 0.0 in grouping output). */
  private final class GKey(val v: Any) {
    override def equals(o: Any): Boolean = o match {
      case g: GKey => GKey.deepEq(v, g.v)
      case _ => false
    }
    override def hashCode: Int = GKey.deepHash(v)
  }
  private object GKey {
    def deepEq(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (x: Row, y: Row) =>
        x.length == y.length && (0 until x.length).forall(i => deepEq(x.get(i), y.get(i)))
      case (x: Seq[_], y: Seq[_]) =>
        x.length == y.length && x.iterator.zip(y.iterator).forall { case (p, q) => deepEq(p, q) }
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x, _) if x != null => x.equals(b)
      case _ => false
    }
    def deepHash(a: Any): Int = a match {
      case null => 0
      case r: Row => (0 until r.length).foldLeft(1)((h, i) => 31 * h + deepHash(r.get(i)))
      case s: Seq[_] => s.foldLeft(1)((h, x) => 31 * h + deepHash(x))
      case x: Array[Byte] => java.util.Arrays.hashCode(x)
      case x => x.hashCode
    }
  }

  /** Turn raw per-(pid, group-key) weights into cumulative offsets (+
    * per-group totals): group runs are contiguous in pid order under the
    * range partitioning, so a per-group sort by pid and a running sum give
    * each (pid, group) cell the rank/weight mass before it. */
  private def cumulate[G](
      counts: Seq[(Int, G, Long)]): Seq[(Int, G, Long, Long)] =
    counts.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._1)
      val total = sorted.map(_._3).sum
      var acc = 0L
      sorted.map { case (pid, _, w) =>
        val o = acc; acc += w; (pid, g, o, total)
      }
    }

  /** Pin the keyed stage and build the broadcastable per-(pid, group)
    * offset table plus the join condition against it.
    *
    * JSON-stable group keys take the SINGLE-PASS path: the per-(pid,
    * group) weights ride the pinning job itself as an `observe()` map
    * aggregate (keyed by the group's `to_json` surrogate — never null, a
    * null group renders "{}"), so no second traversal happens before the
    * final join. Other key types pin first and pay one explicit counts
    * job over the pinned blocks, joining back on the NATIVE group column
    * (null-safe `<=>`) — grouping/join equality then handles the cases the
    * JSON surrogate can't (-0.0 == 0.0, sub-millisecond timestamps).
    *
    * `weightCol` = None counts rows (rank); Some(w) sums weights
    * (prefix sum). */
  private def pinWithOffsets(
      spark: SparkSession,
      keyedRaw: DataFrame,
      weightCol: Option[String]
  ): (DataFrame, DataFrame, Column) = {
    val offBase = Seq(
      StructField("_gopid", IntegerType, nullable = false),
      StructField("_goff", LongType, nullable = false),
      StructField("_gtot", LongType, nullable = false))
    if (jsonStableKey(keyedRaw.schema("_ggrp").dataType)) {
      val obs = Observation()
      val sumByKey = udaf(Materialize.SumByKey)
      // null weights contribute 0, matching both sum() aggregation and the
      // running-sum window (which skip nulls)
      val w = weightCol.map(c => coalesce(col(c), lit(0L))).getOrElse(lit(1L))
      val keyed = Materialize.pin(
        keyedRaw
          .withColumn("_ggs", to_json(struct(col("_ggrp").as("g"))))
          .observe(obs,
            sumByKey(
              concat_ws("|", col("_gpid"), col("_ggs")), w).as("wmap")))
      val counts = obs.get("wmap")
        .asInstanceOf[scala.collection.Map[String, Long]]
        .toSeq.map { case (k, v) =>
          val (pid, g) = parseKey(k); (pid, g, v)
        }
      val offRows = new java.util.ArrayList[Row]()
      cumulate(counts).foreach { case (pid, g, off, tot) =>
        offRows.add(Row(pid, g, off, tot))
      }
      val offSchema = StructType(
        offBase.head +: StructField("_gogs", StringType, nullable = false) +:
          offBase.tail)
      val offDf = spark.createDataFrame(offRows, offSchema)
      (keyed, offDf,
        col("_gpid") === col("_gopid") && col("_ggs") === col("_gogs"))
    } else {
      val keyed = Materialize.pin(keyedRaw)
      val agg = weightCol match {
        case Some(wc) =>
          keyed.groupBy("_gpid", "_ggrp")
            .agg(coalesce(sum(col(wc)), lit(0L)).as("_gs"))
        case None => keyed.groupBy("_gpid", "_ggrp").count()
      }
      val counts = agg.collect().toSeq
        .map(r => (r.getInt(0), new GKey(r.get(1)), r.getLong(2)))
      val offRows = new java.util.ArrayList[Row]()
      cumulate(counts).foreach { case (pid, g, off, tot) =>
        offRows.add(Row(pid, g.v, off, tot))
      }
      val offSchema = StructType(
        offBase.head +: keyedRaw.schema("_ggrp").copy(name = "_gogrp") +:
          offBase.tail)
      val offDf = spark.createDataFrame(offRows, offSchema)
      (keyed, offDf,
        col("_gpid") === col("_gopid") && col("_ggrp") <=> col("_gogrp"))
    }
  }

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
    requireNoClash(df, rankOutputCols)
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val (keyed, offDf, joinCond) =
      pinWithOffsets(spark, keyedStage(df, group, order, p), weightCol = None)

    val local = keyed.withColumn(
      "_grn",
      row_number().over(
        Window.partitionBy(col("_gpid"), col("_ggrp")).orderBy(order: _*)))

    local
      .join(broadcast(offDf), joinCond)
      .withColumn("group_rank", col("_goff") + col("_grn"))
      .withColumn("group_count", col("_gtot"))
      .drop("_ggrp", "_ggs", "_gpid", "_grn",
        "_gopid", "_gogrp", "_gogs", "_goff", "_gtot")
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
    requireNoClash(df, prefixOutputCols)
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val (keyed, offDf, joinCond) = pinWithOffsets(spark,
      keyedStage(df.withColumn("_gw", weight.cast("long")), group, order, p),
      weightCol = Some("_gw"))

    val w = Window.partitionBy(col("_gpid"), col("_ggrp"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("_gcum", sum(col("_gw")).over(w))

    local
      .join(broadcast(offDf), joinCond)
      .withColumn("group_prefix_sum", col("_goff") + col("_gcum"))
      .drop("_ggrp", "_ggs", "_gpid", "_gw", "_gcum",
        "_gopid", "_gogrp", "_gogs", "_goff", "_gtot")
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
