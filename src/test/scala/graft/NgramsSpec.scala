package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Decontaminate
import graft.text.Ngrams

/** Brute-force equivalence proofs for the corpus-hygiene n-gram operators
  * (decontamination overlap, boilerplate frequency, distinctive terms). */
class NgramsSpec extends AnyFunSuite with SparkTestBase {

  private def bruteTokens(t: String): Seq[String] = {
    val s = t.trim
    if (s.isEmpty) Seq.empty else s.split("\\s+").toSeq
  }
  private def bruteGrams(t: String, n: Int): Seq[String] =
    bruteTokens(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq

  private val docs = Seq(
    (1L, "a b c d e"),
    (2L, "  c d e   f  "), // leading/trailing/multi-space tokenization edges
    (3L, "x y"),           // shorter than n=3 -> no grams
    (4L, ""),              // blank -> no tokens
    (5L, "a b c a b c"),   // repeated grams inside one doc
    (6L, "q r s t u v")
  )

  test("wordNgrams matches sliding-window brute force incl. edge docs") {
    import spark.implicits._
    val got = docs.toDF("id", "text")
      .select(col("id"), Ngrams.wordNgrams(Ngrams.tokens(col("text")), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, t) =>
      assert(got(id) == bruteGrams(t, 3), s"doc $id")
    }
  }

  test("Decontaminate.contaminated matches brute-force distinct-overlap counts") {
    import spark.implicits._
    val corpus = docs.filter(_._1 % 2 == 1) // 1, 3, 5
    val bench = docs.filter(_._1 % 2 == 0)  // 2, 4, 6
    val benchSet = bench.flatMap(d => bruteGrams(d._2, 3)).toSet
    val expected = corpus
      .map { case (id, t) => id -> bruteGrams(t, 3).distinct.count(benchSet) }
      .filter(_._2 > 0)
      .toMap

    for (bcast <- Seq(true, false)) {
      val got = Decontaminate.contaminated(
        spark, corpus.toDF("id", "text"), bench.toDF("id", "text"),
        "id", "text", n = 3, broadcastBenchmark = bcast)
        .as[(Long, Long)].collect().toMap
      assert(got == expected.map { case (k, v) => k -> v.toLong },
        s"broadcastBenchmark=$bcast")
    }
  }

  test("topNgrams counts occurrences (not distinct docs) with a total tie order") {
    import spark.implicits._
    val counts = docs.flatMap(d => bruteGrams(d._2, 3))
      .groupBy(identity).map { case (g, occ) => (g, occ.size.toLong) }
    val expected = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(4)
    val got = Ngrams.topNgrams(docs.toDF("id", "text"), "text", n = 3, k = 4)
      .as[(String, Long)].collect().toSeq
    assert(got == expected)
    // the repeated gram in doc 5 must count twice
    assert(counts.toMap.get("a b c").contains(3L)) // doc1 once + doc5 twice
  }

  test("distinctiveTerms picks tf desc, df asc, term asc per doc") {
    import spark.implicits._
    val tf = docs.flatMap { case (id, t) => bruteTokens(t).map(id -> _) }
      .groupBy(identity).map { case ((id, w), occ) => (id, w, occ.size.toLong) }
    val df = tf.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      val best = rows.toSeq
        .map { case (_, w, n) => (w, n, df(w)) }
        .sortBy { case (w, n, d) => (-n, d, w) }.head
      id -> best
    }
    val got = Ngrams.distinctiveTerms(docs.toDF("id", "text"), "id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    assert(!got.contains(4L)) // blank doc has no terms
  }
}
