package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel.TextKernels.pyIsSpace

/** Distributed interpolated Kneser-Ney bigram LM trainer — the corpus-scale
  * counterpart of [[graft.quality.Perplexity]] (which trains char-trigram
  * tables driver-side on seed text, the reference-scale setup). CCNet
  * (Wenzek et al. 2020) trains its KenLM on a reference corpus and scores
  * the crawl with it; this operator trains the n-gram model ON a corpus as
  * a Spark aggregation, so the scorer's model can come from data the
  * engine itself curates.
  *
  * Shape (all shuffles on AGGREGATED keys, never on documents):
  *   1. flatMap docs → (w1, w2) bigrams (Python str.split() token parity —
  *      the mode-A word spec, `TextKernels.splitWordCount`).
  *   2. groupBy (w1, w2) count — the one corpus-sized exchange, map-side
  *      combined.
  *   3. context totals + forward type counts from groupBy(w1); backward
  *      (continuation) type counts from groupBy(w2); bigram-type total as
  *      one count(). All over the bigram-TYPE table, orders of magnitude
  *      smaller than the corpus.
  *   4. P_KN(w2|w1) = (max(c12 − D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·),
  *      Pcont(w2) = N1+(·w2) / N1+(··), absolute discount D = 0.75 (exact
  *      in binary — the arithmetic is count ratios, no transcendentals, so
  *      the independent Python oracle replicates it op-for-op).
  *
  * Output: the `topK` bigrams by (c12 desc, w1, w2) with their counts and
  * probability — the model head a scorer would broadcast; the full table
  * is the same DataFrame without the limit.
  */
object KnTrainer {

  /** Python str.split() parity tokens (same whitespace set as
    * `TextKernels.splitWordCount`, which is golden-pinned vs CPython). */
  def pyTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (pyIsSpace(cp)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** The P_KN column from count columns (fixed op order — the oracle
    * contract): (max(c12 − D, 0) + (D·n1p_fwd)·(n1p_bwd / n1p_all)) / c1. */
  private def pKn(discount: Double, n1pAll: Long): Column =
    (greatest(col("c12").cast("double") - lit(discount), lit(0.0)) +
      (lit(discount) * col("n1p_fwd").cast("double")) *
        (col("n1p_bwd").cast("double") / lit(n1pAll.toDouble))) /
      col("c1").cast("double")

  /** Raw bigram-TYPE counts (w1, w2, c12) — the model's sufficient
    * statistic, and the unit of incremental maintenance. */
  def countTypes(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String
  ): DataFrame = {
    import spark.implicits._
    docs.select(col(textCol))
      .as[String]
      .flatMap { t =>
        val ws = pyTokens(t)
        (0 until ws.length - 1).iterator.map(i => (ws(i), ws(i + 1)))
      }
      .toDF("w1", "w2")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
  }

  /** Incremental update: fold `newDocs` into an existing type table. The
    * new corpus is aggregated once; the merge is one type-table-sized
    * exchange — the existing corpus is NEVER re-read (the Incremental/
    * incremental-BPE pattern). Because (w1, w2, c12) is a sufficient
    * statistic for the whole model, `modelFromTypes(updateTypes(...))`
    * is exactly equal to retraining from scratch on the union. */
  def updateTypes(
      spark: SparkSession,
      prevTypes: DataFrame,
      newDocs: DataFrame,
      textCol: String
  ): DataFrame =
    prevTypes.select("w1", "w2", "c12")
      .unionAll(countTypes(spark, newDocs, textCol))
      .groupBy("w1", "w2").agg(sum("c12").as("c12"))

  /** Model table from a (w1, w2, c12) type table:
    * (w1, w2, c12, c1, n1p_fwd, n1p_bwd, p_kn). */
  def modelFromTypes(
      spark: SparkSession,
      typesRaw: DataFrame,
      discount: Double = 0.75
  ): DataFrame = {
    val types = graft.run.Materialize.pin(
      // reused by three aggregations + the scalar count below: pin once so
      // the corpus-sized bigram exchange runs exactly once (reliable
      // checkpoint when spark.graft.checkpointDir is set — the 100-TB mode)
      typesRaw)
    val byW1 = types.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p_fwd"))
    val byW2 = types.groupBy("w2").agg(count(lit(1)).as("n1p_bwd"))
    val n1pAll = types.count()
    types
      .join(byW1, Seq("w1"))
      .join(byW2, Seq("w2"))
      .withColumn("p_kn", round(pKn(discount, n1pAll), 6))
      .select("w1", "w2", "c12", "c1", "n1p_fwd", "n1p_bwd", "p_kn")
  }

  /** Full bigram model table: (w1, w2, c12, c1, n1p_fwd, n1p_bwd, p_kn). */
  def bigramModel(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      discount: Double = 0.75
  ): DataFrame =
    modelFromTypes(spark, countTypes(spark, docs, textCol), discount)

  /** The trigram-level P_KN column (fixed op order — the oracle contract):
    *   P1(c)    = n_c / T
    *   P2(c|b)  = (max(n_bc − D, 0) + (D·n_b_cont)·P1(c)) / n_b_mid
    *   P3(c|ab) = (max(c3 − D, 0) + (D·n_ab)·P2(c|b)) / c_ab
    * — interpolated Kneser-Ney with continuation counts at the lower
    * orders (Chen & Goodman 1999), single absolute discount D at every
    * level. Count ratios only, no transcendentals. */
  private def pKn3(d: Double, total: Long): Column = {
    val p1 = col("n_c").cast("double") / lit(total.toDouble)
    val p2 = (greatest(col("n_bc").cast("double") - lit(d), lit(0.0)) +
      (lit(d) * col("n_b_cont").cast("double")) * p1) /
      col("n_b_mid").cast("double")
    (greatest(col("c3").cast("double") - lit(d), lit(0.0)) +
      (lit(d) * col("n_ab").cast("double")) * p2) /
      col("c_ab").cast("double")
  }

  /** Full interpolated-KN TRIGRAM model. Same shape discipline as the
    * bigram trainer: ONE corpus-sized trigram aggregation (pinned), then
    * every smoothing statistic is an aggregation or join over the far
    * smaller trigram-TYPE table:
    *   c_ab     = c(ab·)      context total        (groupBy w1,w2)
    *   n_ab     = N1+(ab·)    context fan-out      (groupBy w1,w2)
    *   n_bc     = N1+(·bc)    continuation count   (groupBy w2,w3)
    *   n_b_mid  = N1+(·b·)    mid-word type total  (sum of n_bc per w2)
    *   n_b_cont = |{c: N1+(·bc)>0}| continuation fan-out per w2
    *   n_c      = N1+(··c)    last-word continuation count (groupBy w3)
    *   T        = N1+(···)    total trigram types
    * Output: (w1, w2, w3, c3, c_ab, n_ab, n_bc, n_b_mid, n_b_cont, n_c,
    * p_kn3). */
  def trigramModel(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      discount: Double = 0.75
  ): DataFrame = {
    import spark.implicits._
    val types = graft.run.Materialize.pin(
      docs.select(col(textCol))
        .as[String]
        .flatMap { t =>
          val ws = pyTokens(t)
          (0 until ws.length - 2).iterator
            .map(i => (ws(i), ws(i + 1), ws(i + 2)))
        }
        .toDF("w1", "w2", "w3")
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))
    val byCtx = types.groupBy("w1", "w2")
      .agg(sum("c3").as("c_ab"), count(lit(1)).as("n_ab"))
    // rows of the (w2,w3) grouping count DISTINCT w1 — the continuation count
    val bcTypes = types.groupBy("w2", "w3").agg(count(lit(1)).as("n_bc"))
    val byMid = bcTypes.groupBy("w2")
      .agg(sum("n_bc").as("n_b_mid"), count(lit(1)).as("n_b_cont"))
    val byLast = types.groupBy("w3").agg(count(lit(1)).as("n_c"))
    val total = types.count()
    types
      .join(byCtx, Seq("w1", "w2"))
      .join(bcTypes, Seq("w2", "w3"))
      .join(byMid, Seq("w2"))
      .join(byLast, Seq("w3"))
      .withColumn("p_kn3", round(pKn3(discount, total), 6))
      .select("w1", "w2", "w3", "c3", "c_ab", "n_ab", "n_bc",
        "n_b_mid", "n_b_cont", "n_c", "p_kn3")
  }

  /** The topK trigram head by (c3 desc, w1, w2, w3) — a TakeOrdered. */
  def trigramModelTop(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      topK: Int,
      discount: Double = 0.75
  ): DataFrame =
    trigramModel(spark, docs, textCol, discount)
      .orderBy(col("c3").desc, col("w1"), col("w2"), col("w3"))
      .limit(topK)

  /** The topK head by (c12 desc, w1, w2) — a TakeOrdered, no global sort. */
  def bigramModelTop(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      topK: Int,
      discount: Double = 0.75
  ): DataFrame =
    bigramModel(spark, docs, textCol, discount)
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
}
