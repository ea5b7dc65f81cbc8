package graft.sample

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.run.Materialize

/** Deterministic EPOCH SHUFFLE for training-data writers: every row gets a
  * pseudorandom but reproducible global rank, so the corpus can be
  * emitted in a different order each epoch (`seed` = epoch number) with
  * byte-identical re-runs — the reference's stable output ordering
  * contract (`/root/reference/src/CorpusAid.py:2552-2560` keeps
  * first-seen file order) generalized to "any seeded permutation".
  *
  * The global rank is computed the scalable way (the `zipWithIndex`
  * pattern in pure DataFrame ops), NOT with an unpartitioned window —
  * `row_number() OVER (ORDER BY key)` collapses the whole corpus into ONE
  * task at 100 TB:
  *
  *   1. range-repartition on the shuffle key (ascending ranges land in
  *      ascending partition ids);
  *   2. `row_number` windowed BY PARTITION ID — each task sorts only its
  *      own slice;
  *   3. per-partition row counts (|partitions| entries, carried by the
  *      pinning job itself via `observe()` — no second traversal) become
  *      cumulative offsets, broadcast-joined back:
  *      rank = offset(pid) + local row_number.
  */
object EpochShuffle {

  /** Pseudorandom-but-SQL-portable shuffle key: a Lehmer/MINSTD LCG step
    * `t = (id * 48271 + seed) mod (2^31 - 1)` SQUARED mod the same prime.
    * The squaring is load-bearing: with an affine-only key a seed change
    * shifts every key by the same constant, which preserves the circular
    * order — epochs would replay near-identical permutations (caught by
    * the seed-sensitivity test). `t^2 < 2^62` so no int64 overflow, and
    * the whole expression is replayable verbatim in any ANSI engine;
    * production can swap in `xxhash64(id, seed)` via the `key` parameter
    * of [[rank]]. Squares collide in pairs (`t` vs `m-t`) — harmless, the
    * row-unique `tie` column keeps the total order deterministic. */
  def lcgKey(id: Column, seed: Long): Column = {
    val m = lit(2147483647L)
    // pre-fold the id into [0, m) so FULL-RANGE 64-bit ids (xxhash64 doc
    // keys) can't overflow the multiply under ANSI mode: folded * 48271 <
    // 2^47 and t*t < 2^62 both fit in int64. For ids already below m the
    // fold is the identity, so small-id oracles replay the same formula.
    val folded = pmod(id, m)
    val t = pmod(folded * lit(48271L) + lit(seed), m)
    pmod(t * t, m)
  }

  /** The pre-materialization range-partitioned stage — separate so the
    * plan audit can assert the range exchange that [[rank]]'s pinning
    * otherwise hides behind a Scan ExistingRDD. */
  private[graft] def keyedStage(
      df: DataFrame, key: Column, tie: Column, p: Int): DataFrame =
    df.withColumn("_sk", key)
      .repartitionByRange(p, col("_sk"), tie)
      .withColumn("_pid", spark_partition_id())

  /** `df` plus a `shuffle_rank` column: the dense 1-based position of the
    * row in ascending (`key`, `tie`) order. `tie` must be row-unique for a
    * total (reproducible) order. */
  def rank(
      spark: SparkSession,
      df: DataFrame,
      key: Column,
      tie: Column,
      numPartitions: Int = 0
  ): DataFrame = {
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // PINNED (Materialize.pin) because two separate jobs read it — this
    // materialization (which carries the per-partition counts via observe)
    // and the final join. repartitionByRange samples boundaries per
    // execution, so re-evaluating the lazy exchange in the second job could
    // assign boundary rows to different partitions than the ones the
    // offsets were counted on (duplicate/missing ranks). Pinning the
    // partitioning is what any zipWithIndex-style global rank fundamentally
    // requires. Default pinning is localCheckpoint (executor-local blocks,
    // no recompute path — an executor lost between the jobs aborts the
    // query); set spark.graft.checkpointDir to pin to a reliable FS
    // instead, so preemptible-node clusters recompute rather than abort.
    val obs = Observation()
    val sumByKey = udaf(Materialize.SumByKey)
    val keyed = Materialize.pin(
      keyedStage(df, key, tie, p)
        .observe(obs,
          sumByKey(col("_pid").cast("string"), lit(1L)).as("cmap")))

    val local = keyed.withColumn(
      "_rn",
      row_number().over(
        Window.partitionBy("_pid").orderBy(col("_sk"), tie)))

    // |partitions| entries, carried by the pinning job: cumulative offsets
    val counts = obs.get("cmap")
      .asInstanceOf[scala.collection.Map[String, Long]]
      .toSeq.map { case (k, n) => (k.toInt, n) }.sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = acc; acc += n; (pid, o)
    }
    import spark.implicits._
    val offDf = offsets.toDF("_pid", "_off")

    local
      .join(broadcast(offDf), "_pid")
      .withColumn("shuffle_rank", col("_off") + col("_rn"))
      .drop("_sk", "_pid", "_rn", "_off")
  }
}
