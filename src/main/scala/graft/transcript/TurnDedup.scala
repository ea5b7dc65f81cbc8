package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.run.Materialize

/** Cross-conversation exact TURN deduplication — the transcript-payload
  * sibling of [[graft.text.LineDedup]] (C4 §2.2 at turn granularity): an
  * assistant reply or templated user message whose exact text occurs more
  * than once ANYWHERE in the corpus is kept only at its first occurrence in
  * (conv_id, turn_idx) order. Turns shorter than `minLen` chars are never
  * candidates (the guard against deduplicating "ok"/"yes" connective
  * turns). The reference's unit of dedup is one file hash
  * (src/CorpusAid.py:725-733); at transcript scale the template-reply mass
  * is the real target.
  *
  * Same two-pass posture as LineDedup, so UNIQUE turn texts — the
  * overwhelming majority at 100 TB — never shuffle as strings:
  *   1. (hash, count) aggregation over 8-byte xxhash64 keys (map-side
  *      combined, skew-absorbed); count>1 hashes stay distributed;
  *   2. only the duplicate mass semi-joins that hash set and groups BY TEXT
  *      (collisions resolved exactly — a collided-but-unique string gets
  *      count 1 and is dropped from decisions), keeper =
  *      min(struct(conv_id, turn_idx));
  *   3. every turn left-joins the decision table (hash-leading equi keys,
  *      AQE-skew-splittable) for its verdict.
  *
  * Output: one row per input turn — (conv_id, turn_idx, n_occ, keeper_conv,
  * keeper_idx, keep). conv ids are ASCII, so JVM and UTF-8 keeper orderings
  * agree (the q74 lesson).
  */
object TurnDedup {

  /** Entry budget for broadcasting the duplicate-hash set in pass 2 (8-byte
    * keys → ≤ ~32 MB broadcast relation): below it the semi-join broadcasts
    * and UNIQUE turn texts never shuffle AT ALL (r6: the former unconditional
    * `shuffle_hash` hint exchanged every candidate string by hash — the
    * exact full-corpus string shuffle the two-pass design exists to avoid);
    * above it the shuffle tier is the old plan, still hash-led. The count
    * probe is O(1) on the pinned pass-1 output (the KnScorer
    * probe-then-degrade pattern). */
  val DupHashBroadcastMax: Long = 4L << 20

  def dedup(
      spark: SparkSession,
      turns: DataFrame,
      minLen: Int = 15,
      dupHashBroadcastMax: Long = DupHashBroadcastMax
  ): DataFrame = {
    val base = turns.select("conv_id", "turn_idx", "text")
    val cand = base.where(length(col("text")) >= minLen)

    // pass 1: duplicate-candidate hashes, never collected
    val dupHashes = Materialize.pin(
      cand
        .groupBy(xxhash64(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
        .select("h"))

    // pass 2: only the duplicate mass shuffles as strings
    val decisions = cand
      .join(semiSide(dupHashes, dupHashBroadcastMax),
        xxhash64(col("text")) === col("h"), "left_semi")
      .groupBy("text")
      .agg(count(lit(1)).as("_n_occ"),
        min(struct(col("conv_id"), col("turn_idx"))).as("keeper"))
      .where(col("_n_occ") > 1)
      .select(xxhash64(col("text")).as("_dh"), col("text").as("_dtext"),
        col("_n_occ"),
        col("keeper").getField("conv_id").as("_kconv"),
        col("keeper").getField("turn_idx").as("_kidx"))

    // pass 3: per-turn verdict (hash-leading join keys; unique turns miss)
    base
      .join(decisions,
        xxhash64(col("text")) === col("_dh") && col("text") === col("_dtext"),
        "left")
      .select(col("conv_id"), col("turn_idx"),
        coalesce(col("_n_occ"), lit(1L)).as("n_occ"),
        coalesce(col("_kconv"), col("conv_id")).as("keeper_conv"),
        coalesce(col("_kidx"), col("turn_idx")).as("keeper_idx"))
      .withColumn("keep",
        col("keeper_conv") === col("conv_id") &&
          col("keeper_idx") === col("turn_idx"))
  }

  /** Pass-2 build side under the budget probe: broadcast when the pinned
    * duplicate-hash set is small (count is metadata-cheap on the pinned
    * blocks), shuffle tier otherwise — scale-adaptive, never a constant. */
  private def semiSide(dupHashes: DataFrame, budget: Long): DataFrame =
    if (dupHashes.count() <= budget) broadcast(dupHashes)
    else dupHashes.hint("shuffle_hash")

  /** DROPPED turns only — (conv_id, turn_idx) of every non-keeper instance
    * of a duplicated text. Same passes 1-2 as [[dedup]] (bit-identical
    * keeper rule), but never materializes the per-turn verdict: the output
    * is bounded by the DUPLICATE mass, so a caller that only needs to
    * subtract duplicates (the q94 SFT pipeline) can left-anti-join this
    * small table (broadcast under AQE) instead of shuffling the whole
    * corpus through a keep-semi-join. */
  def drops(
      spark: SparkSession,
      turns: DataFrame,
      minLen: Int = 15,
      dupHashBroadcastMax: Long = DupHashBroadcastMax
  ): DataFrame = {
    val cand = turns.select("conv_id", "turn_idx", "text")
      .where(length(col("text")) >= minLen)
    val dupHashes = Materialize.pin(
      cand
        .groupBy(xxhash64(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
        .select("h"))
    // duplicate + hash-collision mass only (small); pinned because it is
    // read twice (decision agg + instance join)
    val mass = Materialize.pin(
      cand.join(semiSide(dupHashes, dupHashBroadcastMax),
        xxhash64(col("text")) === col("h"), "left_semi"))
    val decisions = mass
      .groupBy("text")
      .agg(count(lit(1)).as("_n_occ"),
        min(struct(col("conv_id"), col("turn_idx"))).as("keeper"))
      .where(col("_n_occ") > 1)
      .select(col("text").as("_dtext"), col("keeper"))
    mass
      .join(decisions, col("text") === col("_dtext"))
      .where(!(col("keeper").getField("conv_id") === col("conv_id") &&
        col("keeper").getField("turn_idx") === col("turn_idx")))
      .select("conv_id", "turn_idx")
  }
}
