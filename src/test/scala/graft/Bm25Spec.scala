package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Bm25

/** BM25 retrieval (q80): hand-computed scores through the exact op-order
  * chain, ranking/tie semantics, the no-match and empty-query paths, the
  * over-budget guard, and partition invariance.
  */
class Bm25Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // corpus: dl = 3, 4, 2; total = 9; N = 3; avgdl = 3.0
  private lazy val corpus = Seq(
    (0L, "cat dog cat"),
    (1L, "dog fish bird fish"),
    (2L, "mouse mouse")
  ).toDF("doc_id", "text")

  private def expected(idf: Double, tf: Double, dl: Double, avgdl: Double): Long = {
    val ratio = dl / avgdl
    val norm = Bm25.K1 * (1.0 - Bm25.B + Bm25.B * ratio)
    math.floor(idf * ((tf * (Bm25.K1 + 1.0)) / (tf + norm)) * 1e6 + 0.5).toLong
  }

  test("hand-computed micro-unit scores and ranking") {
    val queries = Seq((100L, "cat fish")).toDF("doc_id", "text")
    val got = Bm25.search(spark, corpus, queries, "text", k = 10)
      .orderBy("rk").as[(Long, Long, Long, Long, Int)].collect()
    val idfCat = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5) // df=1
    val idfFish = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5) // df=1
    val d0 = expected(idfCat, 2.0, 3.0, 3.0) // cat tf=2 in doc 0
    val d1 = expected(idfFish, 2.0, 4.0, 3.0) // fish tf=2 in doc 1
    assert(got.map(r => (r._1, r._2, r._3)) === Array(
      (100L, 0L, 1L), (100L, 1L, 1L))) // doc 0 shorter -> higher norm'd tf
    assert(got(0)._4 === d0)
    assert(got(1)._4 === d1)
    assert(got.map(_._5) === Array(1, 2))
  }

  test("multi-term sums are integer sums; n_matched counts distinct terms") {
    val queries = Seq((7L, "dog dog cat")).toDF("doc_id", "text")
    val got = Bm25.search(spark, corpus, queries, "text", k = 10)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Int)].collect()
    val idfDog = math.log(1.0 + (3.0 - 2.0 + 0.5) / 2.5) // df=2
    val idfCat = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5)
    val doc0 = expected(idfDog, 1.0, 3.0, 3.0) + expected(idfCat, 2.0, 3.0, 3.0)
    assert(got.find(_._2 == 0L).get._4 === doc0)
    assert(got.find(_._2 == 0L).get._3 === 2L) // dog + cat
    assert(got.find(_._2 == 1L).get._3 === 1L) // dog only
    assert(got.find(_._2 == 2L).isEmpty) // no match -> no row
  }

  test("score ties rank by doc_id ascending") {
    val twin = Seq((0L, "a b"), (1L, "a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = Bm25.search(spark, twin, Seq((9L, "a")).toDF("doc_id", "text"),
      "text", k = 10).orderBy("rk").as[(Long, Long, Long, Long, Int)].collect()
    assert(got.map(_._2) === Array(0L, 1L))
    assert(got(0)._4 === got(1)._4)
  }

  test("queries with no corpus hits or no tokens produce no rows") {
    val queries = Seq((1L, "unicorn"), (2L, "   ")).toDF("doc_id", "text")
    assert(Bm25.search(spark, corpus, queries, "text", k = 5).count() === 0L)
  }

  test("over-budget query batch fails loudly") {
    val big = Seq.tabulate(50)(i => (i.toLong, "w" + i)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25.buildModel(spark, corpus, big, "text", maxQueries = 10)
    }
    assert(e.getMessage.contains("broadcast budget"))
  }

  test("scores are partition-invariant") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"alpha beta w$i gamma " * (i % 3 + 1))).toDF("doc_id", "text")
    val queries = Seq((0L, "alpha w7 w13")).toDF("doc_id", "text")
    val a = Bm25.search(spark, docs.repartition(1), queries, "text", k = 8)
      .orderBy("rk").collect()
    val b = Bm25.search(spark, docs.repartition(11), queries, "text", k = 8)
      .orderBy("rk").collect()
    assert(a === b)
  }
}
