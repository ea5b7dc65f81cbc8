package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Timestamp-integrity / pacing signals — the transcript column no document
  * operator touches: `ts`. A production transcript feed carries clock skew,
  * re-delivered batches, and session stitches; a conversation whose turn
  * timestamps run BACKWARD was mis-assembled (two sessions merged, or a
  * retry landed with a stale clock), and an hours-long silent gap means two
  * unrelated sessions were stitched under one conv_id. Both are assembly
  * defects the quality gate should drop before training (the reference's
  * per-document artifact rules — src/CorpusAid.py:245-282 — applied to the
  * transcript TIME axis instead of the text axis).
  *
  * Per-conversation exact-integer signals (order = turn_idx):
  *   - `n_turns`      turns in the conversation;
  *   - `span_ms`      max(ts) − min(ts) (0 for single-turn conversations);
  *   - `n_ooo`        turns whose ts precedes the previous turn's ts
  *                    (out-of-order: the backward-clock defect);
  *   - `max_gap_ms`   largest consecutive-turn gap (0 when n_turns == 1);
  *   - `n_long_gap`   gaps above [[LongGapMs]] (the session-stitch defect);
  *   - `keep`         n_ooo == 0 AND n_long_gap == 0.
  *
  * The generator's clock is perfectly regular (60 s per turn — every gap
  * identical, nothing out of order), so the fixture rule applies:
  * [[inject]] plants both defect classes as deterministic ADDITIVE ts
  * shifts keyed only on (convIdx, turn_idx), replayed verbatim by the
  * oracle SQL over the committed raw dump. Shifts compose by addition, so
  * no CASE-order coupling exists between the two engines.
  *
  * Plan shape: narrow 3-column projection, ONE conv_id hash exchange; the
  * lag window and the final rollup reuse it (HashPartitioning(conv_id)
  * satisfies both ClusteredDistributions — the ConvGate subset rule).
  * Per-row window state is O(1): the mega-conversation costs its length.
  */
object TurnTiming {

  /** Gap above which two turns are treated as separate sessions (30 min —
    * the q38 sessionization gap, reused deliberately: a batch conversation
    * spanning a session boundary is a stitch defect). */
  val LongGapMs: Long = 30L * 60L * 1000L

  /** Deterministic timing-defect injection (additive, so the two defect
    * keys compose without ordering):
    *   cv%7==2,  ti%13==5 → ts −3 min (before the previous turn's ts:
    *                        the out-of-order defect, one per 13-turn
    *                        stride; the FOLLOWING gap grows to +4 min,
    *                        still far under the long-gap bar);
    *   cv%11==6, ti>=9    → whole suffix +2 h (exactly ONE long gap at
    *                        the 8→9 boundary, nothing out of order). */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val ti = col("turn_idx")
    turns.withColumn("ts_ms",
      col("ts_ms")
        + when(cv % 11 === 6 && ti >= 9, 7200000L).otherwise(0L)
        - when(cv % 7 === 2 && ti % 13 === 5, 180000L).otherwise(0L))
  }

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns
      .select("conv_id", "turn_idx", "ts_ms")
      .repartition(col("conv_id"))
      .withColumn("_gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("span_ms"),
        sum(when(col("_gap") < 0L, 1L).otherwise(0L)).as("n_ooo"),
        coalesce(max(col("_gap")), lit(0L)).as("max_gap_ms"),
        sum(when(col("_gap") > LongGapMs, 1L).otherwise(0L))
          .as("n_long_gap"))
      .withColumn("keep", col("n_ooo") === 0L && col("n_long_gap") === 0L)
  }

  /** DuckDB oracle over the committed raw dump: injection (epoch_ms
    * arithmetic), lag window, and rollup replayed by DuckDB's own engines. */
  def oracleSql(golden: String): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, epoch_ms(ts) AS ts_ms,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx,
           ts_ms
             + (CASE WHEN cv % 11 = 6 AND turn_idx >= 9
                     THEN 7200000 ELSE 0 END)
             - (CASE WHEN cv % 7 = 2 AND turn_idx % 13 = 5
                     THEN 180000 ELSE 0 END) AS ts_ms
         FROM raw),
       lg AS (
         SELECT conv_id,
           ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id
             ORDER BY turn_idx) AS gap,
           ts_ms
         FROM inj)
       SELECT conv_id,
         cast(count(*) AS BIGINT) AS n_turns,
         cast(max(ts_ms) - min(ts_ms) AS BIGINT) AS span_ms,
         cast(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ooo,
         cast(coalesce(max(gap), 0) AS BIGINT) AS max_gap_ms,
         cast(sum(CASE WHEN gap > ${LongGapMs} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_long_gap,
         (sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) = 0 AND
          sum(CASE WHEN gap > ${LongGapMs} THEN 1 ELSE 0 END) = 0) AS keep
       FROM lg
       GROUP BY conv_id
       ORDER BY conv_id"""
}
