package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.LineDedup

/** C4-style global line dedup (q74): first-occurrence keep rule, the
  * min-length guard, all-removed and null edges, and partitioning
  * invariance of the (doc_id, pos) keeper.
  */
class LineDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val DUP = "this long line repeats"     // 22 chars >= 15
  private val SHORT = "dup short"                // 9 chars  <  15

  private def run(docs: Seq[(Long, String)], minLen: Int = 15) =
    LineDedup.dedup(spark, docs.toDF("doc_id", "text"), "doc_id", "text", minLen)
      .orderBy("doc_id").as[(Long, String, Int)].collect()

  test("repeated long line survives only at its first (doc_id, pos)") {
    val got = run(Seq(
      (1L, s"$DUP\nunique alpha line"),
      (2L, s"prefix line two here\n$DUP"),
      (3L, DUP)))
    assert(got === Array(
      (1L, s"$DUP\nunique alpha line", 0),
      (2L, "prefix line two here", 1),
      (3L, "", 1))) // fully emptied doc -> "", not null
  }

  test("within-doc repetition: second instance removed") {
    val got = run(Seq((1L, s"$DUP\nmiddle content line\n$DUP")))
    assert(got === Array((1L, s"$DUP\nmiddle content line", 1)))
  }

  test("short duplicated lines are never candidates") {
    val got = run(Seq((1L, s"$SHORT\n$SHORT"), (2L, SHORT)))
    assert(got === Array((1L, s"$SHORT\n$SHORT", 0), (2L, SHORT, 0)))
  }

  test("null and empty texts; empty trailing lines preserved") {
    val got = run(Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "some ending newline\n\n")))
    assert(got === Array(
      (1L, null, 0), (2L, "", 0), (3L, "some ending newline\n\n", 0)))
  }

  test("r6 tiers: forced shuffle/plain-join budgets reproduce the default") {
    val docs = (0L until 40L).map { i =>
      (i, s"shared boilerplate line number ${i % 3}\nunique tail $i words")
    }
    val a = LineDedup.dedup(spark, docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    val b = LineDedup.dedup(spark, docs.toDF("doc_id", "text"),
      "doc_id", "text", dupHashBroadcastMax = 0L, dropSetBroadcastMax = 0L)
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    assert(a === b)
    assert(a.count(_._3 > 0) === 37, "all but the 3 keepers lose a line")
  }

  test("keeper is (doc_id, pos)-minimal regardless of input partitioning") {
    val docs = (0L until 60L).map { i =>
      (i, s"shared boilerplate line number ${i % 5}\nunique tail $i words")
    }
    val a = LineDedup.dedup(spark,
      docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    val b = LineDedup.dedup(spark,
      docs.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    assert(a === b)
    // first five docs keep their boilerplate; the other 55 lose it
    assert(a.take(5).forall(_._3 == 0) && a.drop(5).forall(_._3 == 1))
  }
}
