package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tool-call loop detection — the agent-transcript failure mode with no
  * document analog: an agent stuck re-issuing the IDENTICAL tool call
  * (same tool, same arguments) turn after turn. Runs of length ≥ 3 are
  * loops; a pair is a legitimate retry. All signals are exact integers.
  *
  * A run is maximal consecutive turns (order = turn_idx) with the same
  * (role, tool, text) identity — computed with the ConvGate streak-id
  * trick (change flag → running sum), so per-row window state is O(1)
  * and the mega-conversation costs its length.
  *
  * Per conversation:
  *   - n_tool_calls: tool turns in the trace;
  *   - max_call_run: longest identical-call run over TOOL turns (0 when
  *     the conversation has no tool turns);
  *   - n_loops: number of distinct loop runs (tool runs with length ≥ 3);
  *   - loop_turns: total turns inside loop runs;
  *   - keep = n_loops == 0.
  *
  * Plan shape: narrow projection repartitioned on conv_id once; the
  * lag-1 window, the run-length window over (conv_id, run_id), and the
  * final rollup all reuse that ONE exchange (HashPartitioning(conv_id)
  * satisfies the superset ClusteredDistributions — the subset rule).
  *
  * The generator emits tool turns but never a natural 3-run, so the
  * fixture rule applies: [[inject]] plants deterministic loops as pure
  * value mutations keyed on (convIdx, turn_idx), replayed verbatim by
  * the oracle SQL over the committed raw dump.
  */
object ToolLoops {

  /** Deterministic loop injection: conversations with cv%6==5 get turns
    * ti%11 ∈ {2,3,4} forced to the identical search call — three
    * consecutive identical tool turns per 11-turn stride (strides cut off
    * by conversation end exercise the shorter-run branches). */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val hit = cv % 6 === 5 && col("turn_idx") % 11 >= 2 &&
      col("turn_idx") % 11 <= 4
    turns
      .withColumn("role", when(hit, lit("tool")).otherwise(col("role")))
      .withColumn("tool", when(hit, lit("search")).otherwise(col("tool")))
      .withColumn("text",
        when(hit, lit("{\"q\":\"site status\"}")).otherwise(col("text")))
  }

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val same =
      lag(col("role"), 1).over(w) === col("role") &&
        lag(col("tool"), 1).over(w) === col("tool") &&
        lag(col("text"), 1).over(w) === col("text")

    val t = turns
      .select("conv_id", "turn_idx", "role", "tool", "text")
      .repartition(col("conv_id"))
      .withColumn("_chg", when(coalesce(same, lit(false)), 0L).otherwise(1L))
      .withColumn("_run_id", sum(col("_chg")).over(run))
      .withColumn("_rlen",
        count(lit(1)).over(Window.partitionBy("conv_id", "_run_id")))
      .withColumn("_is_loop_turn",
        col("role") === "tool" && col("_rlen") >= 3L)

    t.groupBy("conv_id")
      .agg(
        sum(when(col("role") === "tool", 1L).otherwise(0L))
          .as("n_tool_calls"),
        coalesce(max(when(col("role") === "tool", col("_rlen"))), lit(0L))
          .as("max_call_run"),
        count_distinct(when(col("_is_loop_turn"), col("_run_id")))
          .as("n_loops"),
        sum(when(col("_is_loop_turn"), 1L).otherwise(0L)).as("loop_turns"))
      .withColumn("keep", col("n_loops") === 0L)
  }

  /** DuckDB oracle over the committed raw dump: injection + streak
    * detection + rollup replayed with DuckDB's own window engine. */
  def oracleSql(golden: String): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role, text, tool,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx,
           CASE WHEN cv % 6 = 5 AND turn_idx % 11 BETWEEN 2 AND 4
                THEN 'tool' ELSE role END AS role,
           CASE WHEN cv % 6 = 5 AND turn_idx % 11 BETWEEN 2 AND 4
                THEN 'search' ELSE tool END AS tool,
           CASE WHEN cv % 6 = 5 AND turn_idx % 11 BETWEEN 2 AND 4
                THEN '{"q":"site status"}' ELSE text END AS text
         FROM raw),
       lg AS (
         SELECT *,
           CASE WHEN lag(role) OVER win = role
                 AND lag(tool) OVER win = tool
                 AND lag(text) OVER win = text
                THEN 0 ELSE 1 END AS chg
         FROM inj
         WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)),
       rid AS (
         SELECT *, sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS UNBOUNDED PRECEDING) AS run_id
         FROM lg),
       rl AS (
         SELECT *, count(*) OVER (PARTITION BY conv_id, run_id) AS rlen
         FROM rid),
       agg AS (
         SELECT conv_id,
           cast(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tool_calls,
           cast(coalesce(max(CASE WHEN role = 'tool' THEN rlen END), 0)
             AS BIGINT) AS max_call_run,
           cast(count(DISTINCT CASE WHEN role = 'tool' AND rlen >= 3
             THEN run_id END) AS BIGINT) AS n_loops,
           cast(sum(CASE WHEN role = 'tool' AND rlen >= 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS loop_turns
         FROM rl
         GROUP BY conv_id)
       SELECT *, (n_loops = 0) AS keep
       FROM agg
       ORDER BY conv_id"""
}
