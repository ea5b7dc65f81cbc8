package graft.transcript

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Assistant boilerplate / refusal signals — the transcript-specific
  * quality heuristic the document suites can't express: an SFT corpus is
  * poisoned by assistant turns that refuse, self-identify as an AI, close
  * with engagement filler, or leave template placeholders, and a
  * conversation whose assistant side is mostly boilerplate should be
  * dropped whole (the CorpusAid rule-chain idea — src/CorpusAid.py's
  * configurable regex filters — applied to the agent-transcript axis).
  *
  * The pattern list is the SINGLE source of truth: the Spark plan compiles
  * it into built-in `regexp_extract_all` expressions and the DuckDB oracle
  * SQL is GENERATED from the same list (the q91 technique — the two
  * engines can never drift). Patterns live in the common Java/RE2 subset:
  * `(?i)` inline flags, character classes, bounded alternation — no
  * lookaround, no backreferences.
  *
  * The generator's corpus contains no natural boilerplate (the fixture
  * rule: every branch must be exercised), so [[inject]] adds deterministic
  * phrases keyed ONLY on (convIdx, turn_idx, role) — value mutations the
  * oracle replays verbatim in SQL over the committed raw dump, exactly the
  * ConvOps.injectViolations posture.
  *
  * Output is conversation-grain, all-integer:
  *   (conv_id, n_assistant, n_refusal, n_selfref, n_closing,
  *    n_placeholder, n_flagged, keep)
  * where n_&lt;pattern&gt; sums MATCH COUNTS over assistant turns, n_flagged
  * counts assistant turns with any hit, and
  * `keep = 4*n_flagged <= n_assistant` (boilerplate on more than a quarter
  * of assistant turns drops the conversation) — cross-multiplied, no
  * division.
  *
  * Plan shape: per-turn counting is shuffle-free narrow projection; the
  * only exchange is the conv_id hash aggregation. Mega-conversation cost
  * is linear (no windows at all).
  */
object Boilerplate {

  /** (name, regex) — common Java/RE2 subset, `(?i)` inline. */
  val patterns: Seq[(String, String)] = Seq(
    ("refusal", "(?i)i(?:'m| am) sorry,? but i can(?:not|'t)"),
    ("selfref", "(?i)as an ai(?: language model)?"),
    ("closing", "(?i)is there anything else i can help you with\\?"),
    ("placeholder", "\\[insert[^\\]]*\\]"))

  /** Deterministic boilerplate injection (assistant turns only), first
    * matching key wins — the same CASE order the oracle SQL replays:
    *   cv%5==1,  ti%4==3 → refusal prefix
    *   cv%9==2,  ti%6==1 → self-reference replaces the text
    *   cv%7==3,  ti%5==2 → engagement-filler suffix
    *   cv%11==4, ti%7==2 → placeholder template replaces the text */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val ti = col("turn_idx")
    val a = col("role") === "assistant"
    turns.withColumn("text",
      when(a && cv % 5 === 1 && ti % 4 === 3,
        concat(lit("I'm sorry, but I cannot help with that. "), col("text")))
        .when(a && cv % 9 === 2 && ti % 6 === 1,
          lit("As an AI language model, I cannot browse the internet."))
        .when(a && cv % 7 === 3 && ti % 5 === 2,
          concat(col("text"), lit(" Is there anything else I can help you with?")))
        .when(a && cv % 11 === 4 && ti % 7 === 2,
          lit("Here is the draft: [insert name here]."))
        .otherwise(col("text")))
  }

  private def hits(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val assistant = col("role") === "assistant"
    val perPattern = patterns.map { case (name, pat) =>
      when(assistant, hits(pat)).otherwise(0L).as(s"h_$name")
    }
    val t = turns
      .select(Seq(col("conv_id"), assistant.as("is_a")) ++ perPattern: _*)
      .withColumn("any_hit",
        patterns.map(p => col(s"h_${p._1}") > 0L).reduce(_ || _))
    val aggs =
      patterns.map { case (name, _) =>
        sum(col(s"h_$name")).as(s"n_$name")
      } ++ Seq(
        sum(when(col("is_a") && col("any_hit"), 1L).otherwise(0L))
          .as("n_flagged"))
    t.groupBy("conv_id")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_assistant"),
        aggs: _*)
      .withColumn("keep", col("n_flagged") * 4 <= col("n_assistant"))
      .select(Seq(col("conv_id"), col("n_assistant")) ++
        patterns.map(p => col(s"n_${p._1}")) ++
        Seq(col("n_flagged"), col("keep")): _*)
  }

  /** The DuckDB oracle, generated from [[patterns]] and the [[inject]]
    * keys over the committed raw dump — injections and counting replayed
    * by DuckDB's own regex (RE2) and aggregation engines. */
  def oracleSql(golden: String): String = {
    def esc(p: String) = p.replace("'", "''")
    val counts = patterns.map { case (name, pat) =>
      s"""cast(sum(CASE WHEN role = 'assistant'
            THEN len(regexp_extract_all(text, '${esc(pat)}'))
            ELSE 0 END) AS BIGINT) AS n_$name"""
    }.mkString(",\n")
    val anyHit = patterns.map { case (_, pat) =>
      s"len(regexp_extract_all(text, '${esc(pat)}')) > 0"
    }.mkString(" OR ")
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role, text,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, role,
           CASE
             WHEN role = 'assistant' AND cv % 5 = 1 AND turn_idx % 4 = 3
               THEN 'I''m sorry, but I cannot help with that. ' || text
             WHEN role = 'assistant' AND cv % 9 = 2 AND turn_idx % 6 = 1
               THEN 'As an AI language model, I cannot browse the internet.'
             WHEN role = 'assistant' AND cv % 7 = 3 AND turn_idx % 5 = 2
               THEN text || ' Is there anything else I can help you with?'
             WHEN role = 'assistant' AND cv % 11 = 4 AND turn_idx % 7 = 2
               THEN 'Here is the draft: [insert name here].'
             ELSE text END AS text
         FROM raw),
       agg AS (
         SELECT conv_id,
           cast(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_assistant,
           $counts,
           cast(sum(CASE WHEN role = 'assistant' AND ($anyHit)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM inj
         GROUP BY conv_id)
       SELECT *, (n_flagged * 4 <= n_assistant) AS keep
       FROM agg
       ORDER BY conv_id"""
  }
}
