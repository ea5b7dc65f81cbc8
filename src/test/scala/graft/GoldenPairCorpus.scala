package graft

/** Dumps the (id, text) near-dup corpus the q16/q18 queries consume at the
  * sf0.01 verify scale (`SparkEntry.dedupCorpusPublic` — distinct synthetic
  * turn texts keyed by xxhash64) for `tools/gen_pairs_golden.py`, which
  * re-derives the MinHash-LSH and SimHash candidate-pair lists with an
  * INDEPENDENT Python implementation (and re-verifies every id as the
  * XXH64 of its text) and commits the pair-list goldens the q16/q18
  * oracles read.
  *
  * Regeneration flow (only on an intentional sketch/banding spec change,
  * commit message naming it):
  *   sbt "Test/runMain graft.GoldenPairCorpus"
  *   python3 tools/gen_pairs_golden.py
  */
object GoldenPairCorpus {
  val corpusPath = "/tmp/graft_pair_corpus.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val corpus = SparkEntry.dedupCorpusPublic(spark, "/root/testdata/sf0.01")
    GoldenIo.writeSingleParquet(corpus, corpusPath)
    println(s"wrote ${corpus.count()} corpus rows to $corpusPath")
    spark.stop()
  }
}
