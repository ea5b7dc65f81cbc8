package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus quote-leak audit — benchmark/eval material quoted INSIDE
  * agent transcripts. Document-side decontamination (q43/q72/q73) asks
  * "does the pretraining corpus contain the eval?"; an SFT pipeline must
  * also ask the transcript-side question: an assistant that pasted an
  * eval item's text into a conversation leaks that item into the
  * fine-tuning set just as surely, and per-item window-overlap counts
  * (GPT-3 Appendix C's n-gram overlap measure) are the report evaluation
  * teams need before trusting a score.
  *
  * This is [[graft.text.SpanDecontaminate.leakReport]] pointed across
  * corpora: probes = each benchmark item's distinct k-char windows
  * (benchmark-bounded, broadcast); corpus = the TURN TEXTS, scanned in
  * one narrow zero-shuffle pass that emits only probe strings actually
  * present — turn text never shuffles. Output per benchmark item:
  * (bench_id, n_windows, n_found) with n_found/n_windows the per-item
  * contamination measure. Hash-free contract (string membership
  * decides; the rolling hash is only a broadcast prefilter), so the
  * DuckDB oracle recomputes BOTH window tables with its own substring
  * engine — no committed golden, end-to-end independent.
  *
  * The generators of the two tables share no 30-char strings, so the
  * fixture rule applies: [[inject]] splices a fixed 60-char slice of a
  * deterministically chosen benchmark item into quoting turns — a pure
  * function of (convIdx, turn_idx) and the rank-ordered benchmark table,
  * replayed verbatim by the oracle SQL.
  */
object QuoteLeak {

  /** Window length (chars) — the q72/q73 contract's default. */
  val K: Int = 30

  /** Quote slice: substring(bench.text, QuotePos, QuoteLen), 1-based. */
  val QuotePos: Int = 11
  val QuoteLen: Int = 60

  /** Deterministic quote injection: turns with cv%13==9 append
    * `' ' + substring(item.text, 11, 60)` where item is the benchmark row
    * with zero-based rank `(cv*7 + turn_idx) % |bench|` in bench_id
    * order. The benchmark table is tiny (eval suites are MBs), so the
    * rank lookup is a broadcast join; the count() that sizes the modulus
    * is a driver action over that same tiny table. */
  def inject(turns: DataFrame, bench: DataFrame): DataFrame = {
    val ranked = bench
      .select(col("bench_id"), col("text").as("_qt"))
      .withColumn("_rk",
        row_number().over(Window.orderBy("bench_id")) - 1L)
    val nB = ranked.count()
    require(nB > 0,
      "benchmark table is empty — the rank modulus needs at least one item")
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val hit = cv % 13 === 9
    turns
      .withColumn("_rk", (cv * 7L + col("turn_idx")) % nB)
      .join(broadcast(ranked.select("_rk", "_qt")), Seq("_rk"), "left")
      .withColumn("text",
        when(hit, concat(col("text"), lit(" "),
          substring(col("_qt"), QuotePos, QuoteLen)))
          .otherwise(col("text")))
      .drop("_rk", "_qt")
  }

  /** Per-item leak report of `bench` (bench_id, text) against the turn
    * corpus. */
  def report(spark: SparkSession, turns: DataFrame, bench: DataFrame)
      : DataFrame =
    graft.text.SpanDecontaminate.leakReport(
      spark, turns.select("text"), bench, "bench_id", "text",
      graft.text.SpanDecontaminate.Config(k = K))

  /** DuckDB oracle: the benchmark slice, rank-ordered injection, BOTH
    * window tables (correlated generate_series + substr), and the
    * found-join recomputed end-to-end — no committed golden. */
  def oracleSql(golden: String): String =
    s"""WITH bench AS (
         SELECT doc_id AS bench_id, substr(text, 41, 100) AS text
         FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 140),
       ranked AS (
         SELECT bench_id, text,
           row_number() OVER (ORDER BY bench_id) - 1 AS rk
         FROM bench),
       raw AS (
         SELECT conv_id, turn_idx, text,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv,
           (CAST(substring(conv_id, 6) AS BIGINT) * 7 + turn_idx)
             % (SELECT count(*) FROM ranked) AS rk
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT t.conv_id, t.turn_idx,
           CASE WHEN t.cv % 13 = 9
                THEN t.text || ' ' || substr(r.text, ${QuotePos}, ${QuoteLen})
                ELSE t.text END AS text
         FROM raw t LEFT JOIN ranked r ON r.rk = t.rk),
       bwins AS (
         SELECT DISTINCT bench_id, substr(text, i, ${K}) AS w FROM (
           SELECT bench_id, text,
             unnest(generate_series(1, length(text) - ${K - 1})) AS i
           FROM ranked)),
       cwins AS (
         SELECT DISTINCT substr(text, i, ${K}) AS w FROM (
           SELECT text,
             unnest(generate_series(1, length(text) - ${K - 1})) AS i
           FROM inj WHERE length(text) >= ${K}))
       SELECT b.bench_id,
         cast(count(*) AS BIGINT) AS n_windows,
         cast(count(c.w) AS BIGINT) AS n_found
       FROM bwins b LEFT JOIN cwins c ON b.w = c.w
       GROUP BY b.bench_id
       ORDER BY b.bench_id"""
}
