package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word n-gram utilities for corpus-hygiene operators (decontamination,
  * boilerplate detection, distinctive-term ranking).
  *
  * All builders are pure column expressions (whole-stage-codegen'd builtins —
  * `split`/`transform`/`slice`/`array_join`, no UDFs), so n-gram construction
  * is a narrow per-row op that never forces a shuffle by itself and pushes
  * only the `text` column through the scan.
  *
  * Tokenization = `\s+` runs after trim — the same formula the DuckDB oracles
  * use (`regexp_split_to_array(trim(text),'\s+')`), so both engines agree on
  * every edge case (blank text, leading/trailing/multiple spaces).
  */
object Ngrams {

  /** Whitespace tokens of trimmed text; empty array for blank/null text.
    * Empty tokens are FILTERED: Spark's `trim` strips only 0x20, so text
    * led by a tab/newline would otherwise emit a leading "" token and
    * corrupt every downstream gram (and a null-text when() condition is
    * null, which previously fell through to split(null) = null instead of
    * the documented empty array). The DuckDB oracles apply the same
    * list_filter. */
  def tokens(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0,
      array().cast("array<string>"))
      .otherwise(filter(split(trim(text), "\\s+"), t => length(t) > 0))

  /** All word n-grams of a token array as space-joined strings, in document
    * order (with duplicates — callers that need set semantics de-dup
    * downstream). Empty array when the document has fewer than n tokens. */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Tokens staged as a materialized column BEFORE the n-gram expression:
    * `wordNgrams` references its token array many times (twice in the size
    * guard, once per gram inside the `transform` lambda), and Catalyst does
    * not common-subexpression-eliminate through higher-order-function
    * lambdas — inlining `split()` there re-tokenizes the document once per
    * gram (O(words²) regex work; measured 3-4 s of the sf0.1 battery).
    * Projecting the array first makes every reference an attribute read. */
  private def withTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))

  /** Exploded (id, gram) pairs — one row per n-gram occurrence. */
  def explodeNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    withTokens(df, textCol)
      .select(col(idCol), explode(wordNgrams(col("__toks"), n)).as("gram"))

  /** Corpus-wide most-frequent word n-grams (boilerplate detector — the
    * header/footer/license-block signal a web-scale pipeline uses to strip
    * template text). One explode + one partial-aggregated hash-agg + a
    * driver-side top-k sort: the shuffle carries (gram, partial_count) pairs
    * only, never document text, and top-k is a TakeOrdered, not a full sort.
    * Ordering (count desc, gram asc) is total, so results are deterministic
    * under ties. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    withTokens(df, textCol)
      .select(explode(wordNgrams(col("__toks"), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)

  /** Most distinctive frequent term per document: rank terms by term
    * frequency desc, then document frequency asc (rarer-across-corpus wins
    * ties), then term asc — an integer-only TF-IDF-style ranking that two
    * engines can reproduce bit-exactly (no float idf at the compare
    * boundary). Shuffles carry (doc_id, term, count) triples; the df side
    * aggregates the already-distinct (doc, term) pairs so no second scan of
    * the corpus is needed. */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = withTokens(df, textCol)
      .select(col(idCol), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("term"), col("tf"), col("df"))
  }
}
