package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Ngrams

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set (the GPT-3/PaLM-style n-gram
  * overlap rule — a training-data pipeline MUST remove eval contamination
  * before a 100-TB crawl becomes a training set).
  *
  * Scale shape: the benchmark side is small by construction (eval suites are
  * MBs, the corpus is TBs), so its distinct n-gram set is BROADCAST and the
  * probe is a map-side broadcast semi-join over the corpus — the corpus
  * never shuffles; the only exchange is the final per-doc count aggregation
  * over (doc_id, gram) survivor pairs, which are a tiny fraction of the
  * input. For a benchmark too large to broadcast, pass
  * `broadcastBenchmark = false` and the same plan runs as a shuffled
  * hash-join on the gram key (corpus grams exchange as compact
  * (hash-partitioned) strings — still never full documents).
  */
object Decontaminate {

  /** Per-document contamination report.
    *
    * @param corpus    (id, text) training documents
    * @param benchmark (text) held-out eval documents
    * @param n         n-gram width in words (real pipelines use 8-13; pick
    *                  relative to typical document length)
    * @return (id, n_shared) — documents sharing at least one distinct
    *         word n-gram with the benchmark, with the count of distinct
    *         shared n-grams
    */
  def contaminated(
      spark: SparkSession,
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      broadcastBenchmark: Boolean = true
  ): DataFrame = {
    // stage the token array as a COLUMN first: Catalyst does not CSE
    // through the n-gram transform() lambda, so inlining tokens() would
    // re-split each benchmark doc once per gram (O(words^2) regex work)
    val benchGrams = benchmark
      .withColumn("__toks", Ngrams.tokens(col(textCol)))
      .select(explode(Ngrams.wordNgrams(col("__toks"), n)).as("gram"))
      .distinct()
    val probe = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    // probe join FIRST, then distinct (doc, gram): a gram repeated inside one
    // document must count once, but deduplicating before the join would
    // shuffle the FULL corpus (doc, gram) set — the exact exchange the
    // broadcast design exists to avoid. The probe side is distinct, so the
    // join introduces no duplicates; dropDuplicates over the (tiny) survivor
    // set gives the identical count with only survivor rows ever exchanged.
    Ngrams.explodeNgrams(corpus, idCol, textCol, n)
      .join(probe, "gram")
      .dropDuplicates(idCol, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
