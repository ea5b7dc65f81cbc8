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

  def dedup(
      spark: SparkSession,
      turns: DataFrame,
      minLen: Int = 15
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
      .join(dupHashes.hint("shuffle_hash"),
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
}
