package graft.transcript

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fenced-code-block mining — the training-mix curation signal for agent
  * transcripts: how much of a conversation is code, and in which
  * languages. Code fraction drives mixture weighting (StarCoder/The-Stack
  * style pipelines bucket corpora by language before sampling), and a
  * conversation whose assistant output is mostly code belongs in a code
  * mix, not a chat mix. The extraction is the reference's regex-filter
  * machinery (src/CorpusAid.py's compiled patterns) pointed at Markdown
  * fences instead of page artifacts.
  *
  * One pattern is the single source of truth for BOTH engines (the q91/q98
  * zero-drift technique): `(?s)`-dotall, non-greedy body, a lowercase
  * info-string captured as the language tag — the common Java/RE2 subset
  * (no lookaround, no backreferences). Group 1 = language ('' for an
  * anonymous fence), group 2 = body.
  *
  * Per-conversation output (exact integers):
  *   - `n_blocks`     fenced blocks across all turns;
  *   - `n_python` / `n_scala`  blocks tagged with the two lexicon
  *                    languages (the generated fixtures — any other tag
  *                    counts only toward n_blocks);
  *   - `n_anon`       untagged fences;
  *   - `code_chars`   total body characters (fence lines excluded);
  *   - `has_code`     n_blocks > 0.
  *
  * The generator emits no backticks (the fixture rule), so [[inject]]
  * appends deterministic fenced blocks keyed only on (convIdx, turn_idx),
  * replayed verbatim by the oracle SQL — newlines are composed with
  * chr(10) on the SQL side so the literals stay printable.
  *
  * Plan shape: per-turn extraction is a narrow codegen'd projection
  * (regexp_extract_all + array folds — no explode, no extra exchange);
  * the only shuffle is the conv_id hash aggregation with map-side partial
  * combine. Mega-conversation cost is linear.
  */
object CodeBlocks {

  /** The fence pattern, shared by the Spark plan and the generated oracle. */
  val FencePattern: String = "(?s)```([a-z]*)\\n(.*?)```"

  /** Deterministic fenced-block injection (any role — tool output often
    * carries code):
    *   cv%9==4, ti%7==3 → python block appended
    *   cv%9==4, ti%7==5 → scala block appended
    *   cv%9==4, ti%7==6 → anonymous block appended */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val ti = col("turn_idx")
    val py = "```python\nfor i in range(3):\n    print(i)\n```"
    val sc = "```scala\nval xs = List(1, 2, 3)\nprintln(xs.sum)\n```"
    val an = "```\nSELECT count(*) FROM runs;\n```"
    turns.withColumn("text",
      when(cv % 9 === 4 && ti % 7 === 3, concat(col("text"), lit("\n" + py)))
        .when(cv % 9 === 4 && ti % 7 === 5,
          concat(col("text"), lit("\n" + sc)))
        .when(cv % 9 === 4 && ti % 7 === 6,
          concat(col("text"), lit("\n" + an)))
        .otherwise(col("text")))
  }

  def signals(spark: SparkSession, turns: DataFrame): DataFrame = {
    val langs = regexp_extract_all(col("text"), lit(FencePattern), lit(1))
    val bodies = regexp_extract_all(col("text"), lit(FencePattern), lit(2))
    def tagCount(tag: String): Column =
      size(filter(langs, l => l === tag)).cast("long")
    val t = turns
      .select(
        col("conv_id"),
        size(langs).cast("long").as("b"),
        tagCount("python").as("py"),
        tagCount("scala").as("sc"),
        tagCount("").as("an"),
        aggregate(bodies, lit(0L), (acc, x) => acc + length(x))
          .as("chars"))
    t.groupBy("conv_id")
      .agg(
        sum(col("b")).as("n_blocks"),
        sum(col("py")).as("n_python"),
        sum(col("sc")).as("n_scala"),
        sum(col("an")).as("n_anon"),
        sum(col("chars")).as("code_chars"))
      .withColumn("has_code", col("n_blocks") > 0L)
  }

  /** DuckDB oracle over the committed raw dump: injection (chr(10)
    * newlines), RE2 extraction with the SAME pattern, list folds, rollup. */
  def oracleSql(golden: String): String = {
    // DuckDB standard string literals keep backslashes literal — only
    // quotes need escaping (the Boilerplate.esc rule)
    val pat = FencePattern.replace("'", "''")
    // the injected literals, composed printable-only + chr(10)
    val py = "'```python' || chr(10) || 'for i in range(3):' || chr(10) " +
      "|| '    print(i)' || chr(10) || '```'"
    val sc = "'```scala' || chr(10) || 'val xs = List(1, 2, 3)' || chr(10)" +
      " || 'println(xs.sum)' || chr(10) || '```'"
    val an = "'```' || chr(10) || 'SELECT count(*) FROM runs;' || chr(10)" +
      " || '```'"
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, text,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id,
           CASE
             WHEN cv % 9 = 4 AND turn_idx % 7 = 3
               THEN text || chr(10) || $py
             WHEN cv % 9 = 4 AND turn_idx % 7 = 5
               THEN text || chr(10) || $sc
             WHEN cv % 9 = 4 AND turn_idx % 7 = 6
               THEN text || chr(10) || $an
             ELSE text END AS text
         FROM raw),
       ex AS (
         SELECT conv_id,
           regexp_extract_all(text, '$pat', 1) AS langs,
           regexp_extract_all(text, '$pat', 2) AS bodies
         FROM inj)
       SELECT conv_id,
         cast(sum(len(langs)) AS BIGINT) AS n_blocks,
         cast(sum(len(list_filter(langs, l -> l = 'python'))) AS BIGINT)
           AS n_python,
         cast(sum(len(list_filter(langs, l -> l = 'scala'))) AS BIGINT)
           AS n_scala,
         cast(sum(len(list_filter(langs, l -> l = ''))) AS BIGINT) AS n_anon,
         cast(sum(coalesce(list_sum(list_transform(bodies,
           b -> cast(length(b) AS BIGINT))), 0)) AS BIGINT) AS code_chars,
         sum(len(langs)) > 0 AS has_code
       FROM ex
       GROUP BY conv_id
       ORDER BY conv_id"""
  }
}
