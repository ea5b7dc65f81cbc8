package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Branch-family detection — the transcript phenomenon between exact
  * conversation dedup (q32: whole trace identical) and conversation
  * near-dup (q103: whole trace similar): REGENERATED RUNS. A production
  * assistant log is full of conversation groups that share an identical
  * opening prefix and then diverge — the user hit "regenerate", an A/B
  * system resampled the reply, or an agent was re-run from a saved
  * prefix. For training, a branch family is one example plus (n−1)
  * near-free duplicates of its prefix mass; the family table is what a
  * sampler needs to down-weight shared prefixes (and what RLHF-style
  * pipelines need to pair divergent continuations of the same context).
  *
  * A family = conversations agreeing EXACTLY on their first
  * min(n_turns, [[PrefixDepth]]) turn texts (prefix length is part of
  * the key, so a 2-turn conversation never groups with a 3-turn one on a
  * 2-turn coincidence). Per family (≥ 2 members):
  *   - family_id     the lexicographically first member's conv_id;
  *   - n_convs       member count;
  *   - pref_len      the keyed prefix length;
  *   - shared_depth  the deepest turn_idx d such that ALL members have
  *     turns 0..d present with identical text — where the branches
  *     actually diverge (≥ pref_len−1 by construction; equals the full
  *     length for verbatim re-ingests);
  *   - max_conv      the lexicographically last member.
  *
  * Plan shape: the prefix signature groups on PER-TURN 128-BIT hash pairs
  * (xxhash64(text), xxhash64(reverse(text)) — the q06 exact-dedup
  * hash-widening pattern, so family identity survives 10^12-turn birthday
  * collisions) — texts leave the scan once, as 16 bytes of longs, and
  * every exchange (signature rollup, family rollup, membership join,
  * depth rollup) moves fixed-width keys only. The family and membership
  * tables are usually tiny (families are rare relative to the corpus) so
  * the joins broadcast UNDER A PROBED ROW BUDGET ([[BroadcastMaxRows]]);
  * a regeneration-heavy corpus that exceeds it degrades to plain
  * fixed-width-key shuffle joins instead of building a multi-GB broadcast
  * on the driver. Shared stages (prefix table, family table) are pinned,
  * so each is computed once per run.
  *
  * The generator draws turns from fragment pools, so 3-turn prefix
  * collisions are vanishingly rare naturally: [[inject]] plants
  * deterministic template openers (4 conversations per 40-conv block
  * share one) as pure value mutations keyed only on (convIdx, turn_idx),
  * replayed verbatim by the oracle SQL — which groups on the RAW TEXT
  * triple, independently re-deriving the families without hashes.
  */
object BranchFamilies {

  val PrefixDepth: Int = 3

  /** Deterministic template-opener injection: conversations with
    * cv%10==7 get turns 0..2 overwritten with a per-40-block template —
    * cv ∈ {7,17,27,37} of each block share an identical 3-turn prefix
    * and keep their natural (divergent) continuations. */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val hit = cv % 10 === 7 && col("turn_idx") <= 2
    turns.withColumn("text",
      when(hit, concat(
        lit("Template opener block "),
        expr("cast(cast(substring(conv_id, 6) as bigint) div 40 as string)"),
        lit(" turn "),
        col("turn_idx").cast("string")))
        .otherwise(col("text")))
  }

  /** Row budget for broadcasting the family / membership tables (~80-byte
    * rows → ≤ ~80 MB relation each). Under it the depth pass keeps the big
    * side's shuffle at zero (broadcast joins); over it the hints drop and
    * the equi-joins shuffle on their fixed-width keys — the r4-verdict
    * degrade tier (a regeneration-heavy corpus where branch families are
    * COMMON must not build a multi-GB broadcast on the driver). The probe
    * is a count on the pinned table (the KnScorer pattern). */
  val BroadcastMaxRows: Long = 1L << 20

  def families(
      spark: SparkSession,
      turns: DataFrame,
      broadcastMaxRows: Long = BroadcastMaxRows): DataFrame = {
    import graft.run.Materialize
    // 128-bit per-turn keys (r4-verdict task: family identity must survive
    // 10^12-turn birthday collisions): the (xxhash64(text),
    // xxhash64(reverse(text))) pair — the q06 hash-widening pattern. The
    // oracle groups on RAW text, so collisions the pair still cannot
    // produce are the only way results could differ.
    val base = turns.select("conv_id", "turn_idx", "text")
    def hashPair(df: DataFrame, extra: Seq[String]): DataFrame =
      df.select((Seq(col("conv_id"), col("turn_idx"),
        xxhash64(col("text")).as("th"),
        xxhash64(reverse(col("text"))).as("tr")) ++ extra.map(col)): _*)

    def keyCol(i: Int, c: String) = coalesce(
      max(when(col("turn_idx") === i, col(c))), lit(-1L))
    // pinned: read by both the family rollup and the membership join (the
    // old shape re-ran the whole prefix aggregation for each)
    val pref = Materialize.pin(
      hashPair(base.filter(col("turn_idx") < PrefixDepth), Nil)
        .groupBy("conv_id")
        .agg(
          count(lit(1)).as("pref_len"),
          keyCol(0, "th").as("h0"), keyCol(1, "th").as("h1"),
          keyCol(2, "th").as("h2"),
          keyCol(0, "tr").as("g0"), keyCol(1, "tr").as("g1"),
          keyCol(2, "tr").as("g2")))

    val famKeys = Seq("h0", "h1", "h2", "g0", "g1", "g2", "pref_len")
    val fam = pref.groupBy(famKeys.map(col): _*)
      .agg(
        min(col("conv_id")).as("family_id"),
        count(lit(1)).as("n_convs"),
        max(col("conv_id")).as("max_conv"))
      .filter(col("n_convs") >= 2L)
    // counting fam re-runs only the tiny rollup over the pinned prefix
    // table, so no second pin is needed
    val famSide =
      if (fam.count() <= broadcastMaxRows) broadcast(fam) else fam

    // family attributes RIDE the membership table so the family rollup is
    // never joined back at the end (the old plan's extra join + pin)
    val memb = Materialize.pin(
      pref.join(famSide, famKeys)
        .select(col("conv_id"), col("family_id"), col("n_convs"),
          col("pref_len"), col("max_conv")))
    val membSide =
      if (memb.count() <= broadcastMaxRows) broadcast(memb) else memb

    // depth pass: join FIRST on the raw trace, hash after — member turns
    // only pay the reverse+hash, non-members never do
    hashPair(base.join(membSide, "conv_id"),
      Seq("family_id", "n_convs", "pref_len", "max_conv"))
      .groupBy("family_id", "turn_idx")
      .agg(
        count(lit(1)).as("n_present"),
        count_distinct(col("th"), col("tr")).as("n_text"),
        max(col("n_convs")).as("nc"),
        max(col("pref_len")).as("pl"),
        max(col("max_conv")).as("mx"))
      .withColumn("_full",
        col("n_present") === col("nc") && col("n_text") === 1L)
      .groupBy("family_id")
      .agg(
        max(col("nc")).as("n_convs"),
        max(col("pl")).as("pref_len"),
        coalesce(
          min(when(!col("_full"), col("turn_idx"))).cast("long") - 1L,
          max(col("turn_idx")).cast("long")).as("shared_depth"),
        max(col("mx")).as("max_conv"))
      .select("family_id", "n_convs", "pref_len", "shared_depth", "max_conv")
      .orderBy("family_id")
  }

  /** DuckDB oracle over the committed raw dump: injection replayed, then
    * families re-derived by grouping on the RAW prefix-text triple (no
    * hashing — an independent formulation of the same equivalence). */
  def oracleSql(golden: String): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, text,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx,
           CASE WHEN cv % 10 = 7 AND turn_idx <= 2
                THEN 'Template opener block ' || cast(cv // 40 AS VARCHAR)
                     || ' turn ' || cast(turn_idx AS VARCHAR)
                ELSE text END AS text
         FROM raw),
       pref AS (
         SELECT conv_id,
           cast(count(*) AS BIGINT) AS pref_len,
           coalesce(max(CASE WHEN turn_idx = 0 THEN text END), chr(1)) AS t0,
           coalesce(max(CASE WHEN turn_idx = 1 THEN text END), chr(1)) AS t1,
           coalesce(max(CASE WHEN turn_idx = 2 THEN text END), chr(1)) AS t2
         FROM inj WHERE turn_idx < ${PrefixDepth} GROUP BY conv_id),
       fam AS (
         SELECT t0, t1, t2, pref_len,
           min(conv_id) AS family_id,
           cast(count(*) AS BIGINT) AS n_convs,
           max(conv_id) AS max_conv
         FROM pref GROUP BY t0, t1, t2, pref_len
         HAVING count(*) >= 2),
       memb AS (
         SELECT p.conv_id, f.family_id, f.n_convs
         FROM pref p JOIN fam f
           ON p.t0 = f.t0 AND p.t1 = f.t1 AND p.t2 = f.t2
          AND p.pref_len = f.pref_len),
       per AS (
         SELECT m.family_id, i.turn_idx,
           cast(count(*) AS BIGINT) AS n_present,
           cast(count(DISTINCT i.text) AS BIGINT) AS n_text,
           max(m.n_convs) AS nc
         FROM inj i JOIN memb m ON i.conv_id = m.conv_id
         GROUP BY m.family_id, i.turn_idx),
       depth AS (
         SELECT family_id,
           cast(coalesce(
             min(CASE WHEN NOT (n_present = nc AND n_text = 1)
                      THEN turn_idx END) - 1,
             max(turn_idx)) AS BIGINT) AS shared_depth
         FROM per GROUP BY family_id)
       SELECT f.family_id, f.n_convs, f.pref_len, d.shared_depth, f.max_conv
       FROM fam f JOIN depth d ON f.family_id = d.family_id
       ORDER BY f.family_id"""
}
