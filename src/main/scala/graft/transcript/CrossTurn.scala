package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-turn repetition signals — the transcript form of the reference's
  * repetition heuristics (src/CorpusAid.py repetition detection operates
  * within one document; a conversation's pathology is a turn REPEATING an
  * earlier turn: stuck agents, template replies, echoed user messages).
  * This is the "window functions over (conv_id ORDER BY turn_idx) for
  * cross-turn repetition rules" operator named by the north star, widened
  * from the flagship's lag-1 rule to any-distance repeats.
  *
  * Per-turn exact-integer signals (order = turn_idx, unique per conv):
  *   - `occ`      occurrence index of this exact text within the
  *                conversation (1 = first time this text appears);
  *   - `first_idx` the turn_idx of that first occurrence (= own turn_idx
  *                when occ == 1);
  *   - `repeat_dist` turn_idx − first_idx (0 for first occurrences) —
  *                the echo distance, a distribution worth auditing;
  *   - `dup_of_prev` exact repeat of the immediately previous turn;
  *   - `dup_of_role_prev` exact repeat of the previous turn of the SAME
  *                role (an assistant repeating itself two exchanges apart
  *                is invisible to the lag-1 rule);
  *   - `run_len`  length of the consecutive identical-text run containing
  *                this turn (the streak-id trick — see below).
  *
  * Verdict: `keep = occ == 1 OR octet_length(text) <= 8` — later exact
  * occurrences are dropped unless the text is a short conversational
  * acknowledgement ("ok", "yes", "+1"), which repeats legitimately.
  *
  * Plan shape: the narrow projection is repartitioned on conv_id ONCE; the
  * turn-order window, the (conv_id, text) occurrence window, the
  * (conv_id, role) lag, and the (conv_id, run_id) run length all reuse
  * that exchange — HashPartitioning(conv_id) satisfies every
  * ClusteredDistribution whose keys contain conv_id (the ConvGate subset
  * rule), so the whole operator costs ONE hash exchange and per-row window
  * state is O(1): the mega-conversation costs its length, never its
  * square.
  */
object CrossTurn {

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val byConv = turns
      .select("conv_id", "turn_idx", "role", "text")
      .repartition(col("conv_id"))

    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wText = Window.partitionBy("conv_id", "text").orderBy("turn_idx")
    val wRole = Window.partitionBy("conv_id", "role").orderBy("turn_idx")

    byConv
      .withColumn("occ", row_number().over(wText).cast("long"))
      .withColumn("first_idx", min(col("turn_idx")).over(wText))
      .withColumn("repeat_dist",
        (col("turn_idx") - col("first_idx")).cast("long"))
      .withColumn("dup_of_prev",
        coalesce(lag(col("text"), 1).over(w) === col("text"), lit(false)))
      .withColumn("dup_of_role_prev",
        coalesce(lag(col("text"), 1).over(wRole) === col("text"),
          lit(false)))
      .withColumn("_chg",
        when(lag(col("text"), 1).over(w).isNull ||
          lag(col("text"), 1).over(w) =!= col("text"), 1L).otherwise(0L))
      .withColumn("_run_id", sum(col("_chg")).over(run))
      .withColumn("run_len",
        count(lit(1)).over(Window.partitionBy("conv_id", "_run_id")))
      .withColumn("keep",
        col("occ") === 1L || octet_length(col("text")) <= 8)
      .select("conv_id", "turn_idx", "occ", "first_idx", "repeat_dist",
        "dup_of_prev", "dup_of_role_prev", "run_len", "keep")
  }

  /** DuckDB oracle over the committed raw dump: every window recomputed by
    * DuckDB's own engine (strlen = UTF-8 bytes = Spark's octet_length). */
  def oracleSql(golden: String): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role, text
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       s AS (
         SELECT conv_id, turn_idx, text,
           cast(row_number() OVER (PARTITION BY conv_id, text
             ORDER BY turn_idx) AS BIGINT) AS occ,
           min(turn_idx) OVER (PARTITION BY conv_id, text
             ORDER BY turn_idx) AS first_idx,
           coalesce(lag(text) OVER win = text, false) AS dup_of_prev,
           coalesce(lag(text) OVER (PARTITION BY conv_id, role
             ORDER BY turn_idx) = text, false) AS dup_of_role_prev,
           CASE WHEN lag(text) OVER win = text THEN 0 ELSE 1 END AS chg
         FROM raw
         WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)),
       rid AS (
         SELECT *, sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS UNBOUNDED PRECEDING) AS run_id
         FROM s),
       rl AS (
         SELECT *, count(*) OVER (PARTITION BY conv_id, run_id) AS run_len
         FROM rid)
       SELECT conv_id, turn_idx, occ, first_idx,
         cast(turn_idx - first_idx AS BIGINT) AS repeat_dist,
         dup_of_prev, dup_of_role_prev, run_len,
         (occ = 1 OR strlen(text) <= 8) AS keep
       FROM rl
       ORDER BY conv_id, turn_idx"""
}
