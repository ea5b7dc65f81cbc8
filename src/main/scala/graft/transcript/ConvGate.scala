package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-LEVEL quality gate — the rollup the per-turn suites don't
  * give: an SFT pipeline drops whole conversations, not turns, when the
  * trace itself is pathological (time travel, tool spam, role monologues).
  * All signals are exact integers; the verdict is integer comparisons only.
  *
  * Signals per conversation (order = (turn_idx, ts_ms), the flagship
  * ordering):
  *   - n_turns, n_tool_calls, n_distinct_tools, tools (sorted csv);
  *   - adjacent-turn gap stats in exact ms: n_gaps, gap_min/max/sum
  *     (0 when the conversation has a single turn);
  *   - max_role_streak: the longest run of consecutive same-role turns
  *     (computed with the running-sum streak-id trick, NOT a per-role
  *     window — every window and aggregation in the plan clusters on
  *     conv_id or a superset, so the whole gate costs ONE hash exchange;
  *     Spark's HashPartitioning(conv_id) satisfies the
  *     ClusteredDistribution of (conv_id, streak_id) grouping).
  *
  * Gate rules, each its own audit column:
  *   - time_ok: no negative adjacent gap (time never regresses);
  *   - tool_ok: 4·n_tool_calls ≤ n_turns (tool turns ≤ 25% of the trace);
  *   - streak_ok: max_role_streak ≤ 2 (no monologues).
  * keep = all three. Mega-conversation skew is bounded: per-row window
  * state is O(1) (lag-1, running sum) and the streak-length window is a
  * sort-only re-use of the same partitioning.
  */
object ConvGate {

  private def boolSum(c: org.apache.spark.sql.Column) =
    sum(when(c, 1L).otherwise(0L))

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts_ms")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val t = turns
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .withColumn("chg",
        when(lag(col("role"), 1).over(w).isNull ||
          lag(col("role"), 1).over(w) =!= col("role"), 1L).otherwise(0L))
      .withColumn("streak_id", sum(col("chg")).over(run))
      .withColumn("slen",
        count(lit(1)).over(Window.partitionBy("conv_id", "streak_id")))

    t.groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        boolSum(col("role") === "tool").as("n_tool_calls"),
        sort_array(collect_set(when(col("role") === "tool", col("tool"))))
          .as("_tools"),
        boolSum(col("gap").isNotNull).as("n_gaps"),
        coalesce(min(col("gap")), lit(0L)).as("gap_min"),
        coalesce(max(col("gap")), lit(0L)).as("gap_max"),
        coalesce(sum(col("gap")), lit(0L)).as("gap_sum"),
        max(col("slen")).as("max_role_streak"))
      .select(col("conv_id"), col("n_turns"), col("n_tool_calls"),
        size(col("_tools")).cast("long").as("n_distinct_tools"),
        array_join(col("_tools"), ",").as("tools"),
        col("n_gaps"), col("gap_min"), col("gap_max"), col("gap_sum"),
        col("max_role_streak"))
      .withColumn("time_ok", col("gap_min") >= 0L)
      .withColumn("tool_ok", col("n_tool_calls") * 4 <= col("n_turns"))
      .withColumn("streak_ok", col("max_role_streak") <= 2L)
      .withColumn("keep",
        col("time_ok") && col("tool_ok") && col("streak_ok"))
  }
}
