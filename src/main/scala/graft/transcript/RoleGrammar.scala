package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Role-transition grammar audit — the corpus-level Markov matrix of
  * (previous role → role) transitions, each classified against the
  * declared conversation grammar. A transcript feed that violates the
  * grammar (a tool result with no preceding call, an assistant reply to
  * an assistant reply, a conversation opening mid-dialogue) was
  * mis-assembled upstream, and the transition matrix is both the audit
  * artifact (how much of the corpus is malformed, and in which specific
  * way) and the input to a structure-aware keep/drop rule — the
  * reference's configurable rule-chain idea (src/CorpusAid.py's ordered
  * regex filters) lifted from the character axis to the dialogue axis.
  *
  * Grammar (the standard agentic-chat FSM):
  *   _start → user | system        (a trace opens with the human or the
  *                                  instruction frame)
  *   system → user                 (the frame is followed by the human)
  *   user → assistant              (the model answers)
  *   assistant → user | tool       (hand back, or call a tool)
  *   tool → assistant | tool       (results return to the model; tool
  *                                  chains/batched calls are legal)
  *
  * Everything else — user→user, assistant→assistant monologues,
  * user→tool (a tool firing with no assistant call), tool→user — is a
  * violation.
  *
  * Output: one row per OBSERVED (prev_role, role) pair with exact counts
  *   - n_transitions  total occurrences;
  *   - n_convs        distinct conversations containing the pair;
  *   - legal          the grammar verdict.
  *
  * Plan shape: narrow 3-column projection, ONE conv_id exchange for the
  * lag-1 window, then a rollup over the tiny (prev_role, role) key space
  * (≤ ~20 rows at ANY corpus size — the matrix is bounded by the role
  * vocabulary squared, so the final exchange is constant-size at 10^12
  * turns; count_distinct(conv_id) partial-aggregates per map task).
  *
  * The generator alternates user/assistant strictly (tool only ever
  * substitutes an assistant slot), so assistant→tool and tool→tool never
  * occur naturally: [[inject]] plants tool-chain runs as deterministic
  * role mutations keyed only on (convIdx, turn_idx), replayed verbatim by
  * the oracle SQL over the committed raw dump.
  */
object RoleGrammar {

  /** The legal transition set (prev>next). */
  val Legal: Seq[String] = Seq(
    "_start>user", "_start>system", "system>user",
    "user>assistant", "assistant>user", "assistant>tool",
    "tool>assistant", "tool>tool")

  /** Deterministic tool-chain injection: conversations with cv%9==4 get
    * turns ti%7 ∈ {3,4} forced to tool role — a 2-run creating
    * assistant→tool, tool→tool, and tool→user transitions at the run's
    * entry, middle, and exit (whichever of those neighbours exist before
    * the conversation ends). */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val hit = cv % 9 === 4 && col("turn_idx") % 7 >= 3 &&
      col("turn_idx") % 7 <= 4
    turns
      .withColumn("role", when(hit, lit("tool")).otherwise(col("role")))
      .withColumn("tool", when(hit, lit("db_query")).otherwise(col("tool")))
  }

  def matrix(spark: SparkSession, turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns
      .select("conv_id", "turn_idx", "role")
      .repartition(col("conv_id"))
      .withColumn("prev_role",
        coalesce(lag(col("role"), 1).over(w), lit("_start")))
      .groupBy("prev_role", "role")
      .agg(
        count(lit(1)).as("n_transitions"),
        count_distinct(col("conv_id")).as("n_convs"))
      .withColumn("legal",
        concat(col("prev_role"), lit(">"), col("role")).isin(Legal: _*))
      .orderBy("prev_role", "role")
  }

  /** DuckDB oracle over the committed raw dump: injection, lag window,
    * rollup, and the grammar IN-list replayed independently. */
  def oracleSql(golden: String): String = {
    val inList = Legal.map(s => s"'$s'").mkString(", ")
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx,
           CASE WHEN cv % 9 = 4 AND turn_idx % 7 BETWEEN 3 AND 4
                THEN 'tool' ELSE role END AS role
         FROM raw),
       lg AS (
         SELECT conv_id, role,
           coalesce(lag(role) OVER (PARTITION BY conv_id
             ORDER BY turn_idx), '_start') AS prev_role
         FROM inj)
       SELECT prev_role, role,
         cast(count(*) AS BIGINT) AS n_transitions,
         cast(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
         (prev_role || '>' || role) IN ($inList) AS legal
       FROM lg
       GROUP BY prev_role, role
       ORDER BY prev_role, role"""
  }
}
