package graft.transcript

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-consistent PII pseudonymization — the coreference-preserving
  * upgrade of [[graft.scrub.Scrubber]]'s flat masks: instead of every email
  * collapsing to `[EMAIL]`, each DISTINCT entity within a conversation gets
  * a stable indexed alias (`[EMAIL_1]`, `[EMAIL_2]`, …) numbered by first
  * appearance, so "mail a.smith@…" and a later "did a.smith@… reply?" stay
  * linked after scrubbing while the identity itself is gone. (The
  * reference's masks are flat, src/CorpusAid.py regex chain; consistency is
  * the transcript-payload requirement — multi-turn coreference is the point
  * of a conversation.)
  *
  * Extraction replays the scrub chain's sequential semantics exactly: kind
  * i's matches are taken from the text with kinds 1..i-1 already masked
  * (an email inside a URL is consumed by the url rule and never becomes an
  * EMAIL entity), using the same compiled patterns the Scrubber chain
  * applies, as built-in `regexp_extract_all`/`regexp_replace` expressions —
  * whole-stage-codegen'd, one narrow pass, no UDFs.
  *
  * Plan shape: per-turn extraction is shuffle-free; the entity table
  * (bounded by distinct (conv, kind, entity) triples — orders of magnitude
  * below turn count) is the only thing that exchanges: one hash aggregation
  * to (conv_id, kind, entity) and one window over (conv_id, kind) for the
  * first-appearance rank. The toxicity rule is excluded — profanity is not
  * an identity and gets no alias.
  */
object Pseudonymize {

  /** (kind, pattern, flat mask) in chain order — the Scrubber rules minus
    * toxicity. Patterns are the common Java/RE2 subset so the DuckDB oracle
    * recomputes extraction with its own regex engine. */
  val kinds: Seq[(String, String, String)] =
    graft.scrub.Scrubber.rules
      .filterNot(_.name == "toxicity")
      .map(r => (r.name, r.pattern.pattern, r.replacement))

  /** Per-entity alias assignment: one row per distinct (conv_id, kind,
    * entity) with its mention count, first-appearance turn, and the
    * conversation-stable alias. `alias_idx` is dense by construction
    * (row_number over distinct entities in first-appearance order). */
  def entities(spark: SparkSession, turns: DataFrame): DataFrame = {
    // chain the masks: kind i extracts from text with kinds 1..i-1 masked
    var cur = col("text")
    val matchCols = kinds.map { case (name, pat, repl) =>
      val m = regexp_extract_all(cur, lit(pat), lit(0)).as(s"m_$name")
      cur = regexp_replace(cur, lit(pat), lit(repl))
      m
    }
    val withArrays = turns
      .where(col("text").isNotNull)
      .select(Seq(col("conv_id"), col("turn_idx")) ++ matchCols: _*)
    val stacked = withArrays
      .select(col("conv_id"), col("turn_idx"),
        explode(map(
          kinds.flatMap { case (name, _, _) =>
            Seq(lit(name), col(s"m_$name"))
          }: _*)).as(Seq("kind", "arr")))
      .where(size(col("arr")) > 0)
      .select(col("conv_id"), col("turn_idx"), col("kind"),
        posexplode(col("arr")).as(Seq("pos", "entity")))

    val ent = stacked
      .groupBy("conv_id", "kind", "entity")
      .agg(count(lit(1)).as("n_mentions"),
        min(struct(col("turn_idx"), col("pos"))).as("first"))
      .select(col("conv_id"), col("kind"), col("entity"),
        col("n_mentions"),
        col("first").getField("turn_idx").as("first_turn_idx"),
        col("first").getField("pos").as("first_pos"))

    // entities are ASCII (addresses, digits), so the tie-break ordering is
    // engine-agnostic; (turn_idx, pos) is already unique per (conv, kind)
    val w = Window.partitionBy("conv_id", "kind")
      .orderBy("first_turn_idx", "first_pos", "entity")
    ent
      .withColumn("alias_idx", row_number().over(w).cast("int"))
      .withColumn("alias",
        concat(lit("["), upper(col("kind")), lit("_"),
          col("alias_idx").cast("string"), lit("]")))
      .select("conv_id", "kind", "entity", "alias_idx", "alias",
        "n_mentions", "first_turn_idx")
  }
}
