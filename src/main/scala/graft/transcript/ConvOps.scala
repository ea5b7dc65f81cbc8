package graft.transcript

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-STRUCTURE operators over the north-rule transcript table
  * (conv_id, turn_idx, role, text, tool, ts) — the integrity half of the
  * quality tier that none of the per-document signal suites cover: a
  * training pipeline over multi-turn transcripts must audit, repair, and
  * assemble CONVERSATIONS, not just score turns. (The reference's unit of
  * integrity is one file and its path-keyed dedup, src/CorpusAid.py:725-733;
  * the transcript payload replaces that with (conv_id, turn_idx) structure
  * invariants.)
  *
  * All three operators are pure window/aggregate plans over the flagship
  * partitioning — audit and assemble cost ONE hash exchange on conv_id,
  * repair adds the DISTINCT's exchange (duplicates collapse map-side in
  * the partial aggregate, so verbatim copies never travel twice) — and
  * every signal is an exact integer count (no floats anywhere).
  * Mega-conversation skew is bounded: per-row window state is O(1)
  * (lag-1, running max) or O(frame) (the bounded context window), never
  * O(conversation).
  *
  * Oracle posture (q87/q88/q89): these are relational-only semantics, so
  * the DuckDB oracle RECOMPUTES them from the committed raw-turn dump with
  * its own window engine — an independent implementation, not a pinned
  * output.
  */
object ConvOps {

  /** Ordering within a conversation: (turn_idx, ts_ms). Natural data has
    * unique turn_idx per conv; injected exact-duplicate rows are identical
    * in every column, so the remaining tie is order-irrelevant. String
    * columns are deliberately NOT order keys (JVM UTF-16 vs UTF-8 byte
    * order would diverge from DuckDB — the q74 lesson). */
  private def w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_ms")

  private def boolSum(c: Column): Column =
    sum(when(c, 1L).otherwise(0L))

  /** q87 — per-conversation structure audit: exact integer violation
    * counts plus an all-clear verdict.
    *
    * Rules (each an adjacent-pair or per-row predicate; prev = lag-1 in
    * (turn_idx, ts_ms) order):
    *   - idx_gap: first turn's idx != 0, or idx jumps by > 1;
    *   - idx_dup: idx equals the previous row's idx (adjacent after the
    *     sort, so this counts rows-minus-distinct without a countDistinct);
    *   - ts_regress: ts strictly below the previous turn's ts;
    *   - role_repeat: same role as the previous turn, for user/assistant
    *     (tool runs are judged by orphan_tool instead);
    *   - orphan_tool: a tool turn opening the conversation or following
    *     another tool turn (a tool result must answer an actor's turn —
    *     in the generator's model a tool turn occupies the assistant slot
    *     after a user turn, which is legal);
    *   - tool_mismatch: role=='tool' without a tool name, or a tool name
    *     on a non-tool row;
    *   - n_empty: null or zero-length text.
    *
    * Input: (conv_id, turn_idx, role, text, tool, ts_ms:long). Output one
    * row per conversation; `ok` iff every violation count is zero. */
  def audit(spark: SparkSession, turns: DataFrame): DataFrame = {
    val prev = turns
      .withColumn("prev_idx", lag(col("turn_idx"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
    prev
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        boolSum(col("role") === "user").as("n_user"),
        boolSum(col("role") === "assistant").as("n_assistant"),
        boolSum(col("role") === "tool").as("n_tool"),
        boolSum(col("text").isNull || col("text") === "").as("n_empty"),
        boolSum(
          (col("prev_idx").isNull && col("turn_idx") =!= 0) ||
            (col("prev_idx").isNotNull &&
              col("turn_idx") - col("prev_idx") > 1)).as("idx_gaps"),
        boolSum(col("prev_idx").isNotNull &&
          col("turn_idx") === col("prev_idx")).as("idx_dup"),
        boolSum(col("prev_ts").isNotNull &&
          col("ts_ms") < col("prev_ts")).as("ts_regress"),
        boolSum(col("prev_role").isNotNull &&
          col("prev_role") === col("role") &&
          col("role").isin("user", "assistant")).as("role_repeat"),
        boolSum(col("role") === "tool" &&
          (col("prev_role").isNull || col("prev_role") === "tool"))
          .as("orphan_tool"),
        boolSum((col("role") === "tool") =!= (col("tool") =!= ""))
          .as("tool_mismatch"))
      .withColumn("ok",
        col("n_empty") === 0 && col("idx_gaps") === 0 &&
          col("idx_dup") === 0 && col("ts_regress") === 0 &&
          col("role_repeat") === 0 && col("orphan_tool") === 0 &&
          col("tool_mismatch") === 0)
  }

  /** q88 — deterministic structural repair, the fix-what-q87-flags
    * normalization a pipeline runs before packing/assembly:
    *   1. exact-duplicate rows collapse to one (DISTINCT);
    *   2. tool-name consistency is forced: non-tool rows get tool='',
    *      tool rows with no name get 'unknown';
    *   3. empty-text turns drop;
    *   4. turn_idx is re-issued contiguously from 0 in (turn_idx, ts_ms)
    *      order;
    *   5. ts becomes its own running max, so time never regresses.
    * Emits the repaired table (original_idx kept for lineage). Pure
    * relational ops — DISTINCT, one window — so the oracle recomputes it. */
  def repair(spark: SparkSession, turns: DataFrame): DataFrame = {
    val fixed = turns.distinct()
      .withColumn("tool",
        when(col("role") =!= "tool", lit(""))
          .when(col("tool") === "", lit("unknown"))
          .otherwise(col("tool")))
      .filter(col("text").isNotNull && col("text") =!= "")
    fixed
      .withColumn("original_idx", col("turn_idx"))
      .withColumn("turn_idx",
        (row_number().over(w) - 1).cast("int"))
      .withColumn("ts_ms",
        max(col("ts_ms")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("conv_id", "turn_idx", "original_idx", "role", "text",
        "tool", "ts_ms")
  }

  /** q89 — bounded context assembly (the SFT-example shape): for every
    * assistant turn, the previous `ctxTurns` turns rendered "role: text"
    * and joined with newlines, in turn order. The frame is ROWS-bounded,
    * so per-row window state is O(ctxTurns) — a mega-conversation costs
    * its length, never its square (the unbounded-preceding collect_list
    * variant would be the 100-TB straggler). Emits (conv_id, turn_idx,
    * n_ctx, context) for assistant turns. */
  def assemble(spark: SparkSession, turns: DataFrame, ctxTurns: Int = 6): DataFrame = {
    val frame = w.rowsBetween(-ctxTurns, -1)
    turns
      .withColumn("n_ctx", count(lit(1)).over(frame))
      .withColumn("context",
        array_join(
          collect_list(concat(col("role"), lit(": "), col("text")))
            .over(frame),
          "\n"))
      .filter(col("role") === "assistant")
      .select("conv_id", "turn_idx", "n_ctx", "context")
  }

  /** q95 — conversation-level language-consistency rollup over the
    * flagship's per-turn verdicts (the CCNet-style "a document has one
    * language" rule lifted to conversations): majority language by count
    * with a deterministic ASCII tie-break, distinct-language count, an
    * exact-integer consistency test (majority ≥ 75% of turns, by
    * cross-multiplication), and the conversation keep (consistent AND
    * ≥ 50% of turns individually kept).
    *
    * Input: per-turn (conv_id, lang, keep) — in the battery this is the
    * flagship QualityFilter output, so the oracle can GROUP the committed
    * q15 golden.
    *
    * Cost contract: the per-turn input is scanned ONCE. The narrow
    * projection is repartitioned on conv_id up front, so (a) the
    * (conv_id, lang) groupBy, the conv-level rollup, the majority window,
    * and the final join all reuse that ONE exchange (HashPartitioning on
    * conv_id satisfies every ClusteredDistribution whose keys contain
    * conv_id — the q92/ConvGate subset rule), and (b) the two consumers of
    * `counts` share the exchange via stage reuse, so an EXPENSIVE perTurn
    * lineage (the flagship langid+perplexity+scrub chain) evaluates once
    * on the map side instead of once per aggregate subtree — the previous
    * shape re-ran the whole chain for the per-conv totals. */
  def langRollup(spark: SparkSession, perTurn: DataFrame): DataFrame = {
    val byConv = perTurn.select("conv_id", "lang", "keep")
      .repartition(col("conv_id"))
    val counts = byConv.groupBy("conv_id", "lang").agg(
      count(lit(1)).as("lang_cnt"),
      boolSum(col("keep")).as("kept_cnt"))
    val wm = Window.partitionBy("conv_id")
      .orderBy(col("lang_cnt").desc, col("lang"))
    val major = counts
      .withColumn("rn", row_number().over(wm))
      .where(col("rn") === 1)
      .select(col("conv_id"), col("lang").as("major_lang"),
        col("lang_cnt").as("major_cnt"))
    val tot = counts.groupBy("conv_id").agg(
      sum(col("lang_cnt")).as("n_turns"),
      sum(col("kept_cnt")).as("n_kept"),
      count(lit(1)).as("n_langs"))
    tot.join(major, Seq("conv_id"))
      .withColumn("lang_consistent",
        col("major_cnt") * 4 >= col("n_turns") * 3)
      .withColumn("conv_keep",
        col("lang_consistent") && col("n_kept") * 2 >= col("n_turns"))
      .select("conv_id", "n_turns", "n_kept", "n_langs", "major_lang",
        "major_cnt", "lang_consistent", "conv_keep")
  }

  /** Deterministic violation injection for the q87/q88 oracles: the
    * generator's transcripts are structurally CLEAN (contiguous idx,
    * monotone ts, legal roles), so — the fixture rule — every audit branch
    * is exercised by injections keyed only on (convIdx, turn_idx), replayed
    * verbatim by the oracle SQL over the raw dump:
    *   cv%7==1,  ti%3==2 → ts pulled back 10 min      (ts_regress)
    *   cv%13==3, ti%4==1 → role forced 'user'          (role_repeat;
    *                        on a tool row also a tool_mismatch)
    *   cv%17==4, ti%6==1 → tool name flipped           (tool_mismatch)
    *   cv%19==5, ti%6==0 → text emptied                (n_empty)
    *   cv%29==7, ti==0   → conversation opens 'tool'   (orphan_tool)
    *   cv%11==2, ti%5==2 → row dropped                 (idx_gaps)
    *   cv%23==6, ti%9==3 → row duplicated              (idx_dup)
    * Value mutations first (all reading ORIGINAL columns), then the drop,
    * then the duplicate union — the same order as the SQL. Input columns
    * (conv_id, turn_idx, role, text, tool, ts_ms); cv parsed from the
    * generator's conv-%08d id. */
  def injectViolations(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val ti = col("turn_idx")
    val mutated = turns.select(
      col("conv_id"),
      ti,
      when(cv % 29 === 7 && ti === 0, lit("tool"))
        .when(cv % 13 === 3 && ti % 4 === 1, lit("user"))
        .otherwise(col("role")).as("role"),
      when(cv % 19 === 5 && ti % 6 === 0, lit(""))
        .otherwise(col("text")).as("text"),
      when(cv % 29 === 7 && ti === 0, lit("calculator"))
        .when(cv % 17 === 4 && ti % 6 === 1,
          when(col("role") === "tool", lit("")).otherwise(lit("websearch")))
        .otherwise(col("tool")).as("tool"),
      when(cv % 7 === 1 && ti % 3 === 2, col("ts_ms") - 600000L)
        .otherwise(col("ts_ms")).as("ts_ms"))
    val dropped = mutated.filter(!(cv % 11 === 2 && ti % 5 === 2))
    dropped.union(dropped.filter(cv % 23 === 6 && ti % 9 === 3))
  }
}
