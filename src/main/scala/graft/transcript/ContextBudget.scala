package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window truncation — the serving/SFT preparation step that keeps
  * each conversation's most RECENT suffix of turns within a fixed byte
  * budget (the model's context window), never dropping the opening turn
  * (the system/anchor turn carries the instruction frame).
  *
  * Exact-integer contract per turn:
  *   - weight  = octet_length(text) + 16 (UTF-8 bytes + fixed per-turn
  *     framing overhead; bytes, not chars — both engines agree on UTF-8);
  *   - cum_from_end = running sum of weights from the LAST turn backwards
  *     (a reverse-ordered window, ROWS UNBOUNDED PRECEDING — O(1) state);
  *   - kept = cum_from_end <= budget OR turn_idx == first turn of the
  *     conversation (the anchor exemption; it applies WHETHER OR NOT the
  *     suffix budget already covers the opener);
  *   - new_idx = contiguous 0-based reindex over kept turns in turn order
  *     (the emitted training example must stay gap-free).
  *
  * Plan shape: ONE conv_id exchange; the reverse cumulative window, the
  * first-turn min, and the kept-reindex row_number all cluster on conv_id
  * (subset rule). The mega-conversation costs its length — and is exactly
  * the conversation truncation exists for.
  */
object ContextBudget {

  def truncate(
      spark: SparkSession,
      turns: DataFrame,
      budgetBytes: Long = 2048L): DataFrame = {
    val byConv = turns
      .select("conv_id", "turn_idx", "role", "text")
      .repartition(col("conv_id"))
      .withColumn("weight", octet_length(col("text")).cast("long") + 16L)

    val rev = Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("conv_id")
    val fwd = Window.partitionBy("conv_id").orderBy("turn_idx")

    byConv
      .withColumn("cum_from_end", sum(col("weight")).over(rev))
      .withColumn("_first_idx", min(col("turn_idx")).over(whole))
      .withColumn("kept",
        col("cum_from_end") <= budgetBytes ||
          col("turn_idx") === col("_first_idx"))
      .withColumn("new_idx",
        when(col("kept"),
          (sum(when(col("kept"), 1L).otherwise(0L)).over(fwd) - 1L)
            .cast("int")))
      .select("conv_id", "turn_idx", "role", "weight", "cum_from_end",
        "kept", "new_idx")
  }

  /** DuckDB oracle over the committed raw dump: the same reverse running
    * sum, anchor exemption, and kept-reindex replayed by DuckDB's window
    * engine (strlen = UTF-8 bytes, Spark's octet_length). */
  def oracleSql(golden: String, budgetBytes: Long = 2048L): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role, text
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       w AS (
         SELECT conv_id, turn_idx, role,
           cast(strlen(text) AS BIGINT) + 16 AS weight
         FROM raw),
       c AS (
         SELECT *,
           cast(sum(weight) OVER (PARTITION BY conv_id ORDER BY turn_idx
             DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_from_end,
           min(turn_idx) OVER (PARTITION BY conv_id) AS first_idx
         FROM w),
       k AS (
         SELECT conv_id, turn_idx, role, weight, cum_from_end,
           (cum_from_end <= $budgetBytes OR turn_idx = first_idx) AS kept
         FROM c)
       SELECT conv_id, turn_idx, role, weight, cum_from_end, kept,
         CASE WHEN kept THEN cast(sum(CASE WHEN kept THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
             ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) END AS new_idx
       FROM k
       ORDER BY conv_id, turn_idx"""
}
