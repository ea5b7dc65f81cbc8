package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.SpanDecontaminate

/** Span-level benchmark decontamination (q72): hand-checked cut semantics
  * (start/middle/end/overlap/identity), tier equality, and the guarantee
  * that a benchmark excerpt's source document is always cut.
  */
class SpanDecontaminateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val K4 = SpanDecontaminate.Config(k = 4)

  private def run(
      corpus: Seq[(Long, String)],
      bench: Seq[String],
      cfg: SpanDecontaminate.Config = K4) =
    SpanDecontaminate.cut(spark,
      corpus.toDF("doc_id", "text"), bench.toDF("text"),
      "doc_id", "text", cfg)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect()

  test("match at start, middle, end; non-match untouched") {
    val got = run(
      Seq((1L, "ABCDxyz"), (2L, "xxABCDyy"), (3L, "zzzABCD"), (4L, "nothing")),
      Seq("ABCD"))
    assert(got === Array(
      (1L, "xyz", 1, 4), (2L, "xxyy", 1, 4), (3L, "zzz", 1, 4),
      (4L, "nothing", 0, 0)))
  }

  test("overlapping probe windows merge into one maximal span") {
    // probes: all 4-char windows of "ABCDE" -> positions 0 and 1 in doc
    val got = run(Seq((1L, "xxABCDEyy")), Seq("ABCDE"))
    assert(got === Array((1L, "xxyy", 1, 5)))
  }

  test("doc identical to a benchmark text is cut entirely") {
    val got = run(Seq((1L, "ABCDEFGH")), Seq("ABCDEFGH"))
    assert(got === Array((1L, "", 1, 8)))
  }

  test("two separated contaminated spans count separately") {
    val got = run(Seq((1L, "ABCD123456WXYZ")), Seq("ABCD", "WXYZ"))
    assert(got === Array((1L, "123456", 2, 8)))
  }

  test("null and short texts pass through") {
    val got = run(Seq((1L, null.asInstanceOf[String]), (2L, "ab")), Seq("ABCD"))
    assert(got === Array((1L, null, 0, 0), (2L, "ab", 0, 0)))
  }

  test("large (distributed) tier equals the broadcast tier") {
    val corpus = (0L until 200L).map(i =>
      (i, s"prefix$i SHAREDBOILERPLATE${i % 7} tail$i"))
    val bench = Seq("SHAREDBOILERPLATE0", "SHAREDBOILERPLATE3")
    val small = run(corpus, bench, SpanDecontaminate.Config(k = 6))
    val large = run(corpus, bench,
      SpanDecontaminate.Config(k = 6, maxProbeChars = 1))
    assert(small === large)
    assert(small.count(_._3 > 0) > 0)
  }

  test("leakReport: hand-computed per-item found counts; duplicates count once") {
    // bench item 1 "ABCDEF" (k=4): windows ABCD BCDE CDEF; corpus has ABCD
    // (twice — counts once) and CDEF but not BCDE. item 2: no windows found.
    // item 3 "XYXYXY": distinct windows XYXY YXYX (dup XYXY counts once).
    val corpus = Seq(
      (10L, "zzABCDzz"), (11L, "ABCD"), (12L, "qqCDEFqq"), (13L, "XYXY"))
      .toDF("doc_id", "text")
    val bench = Seq((1L, "ABCDEF"), (2L, "NOPEQRST"), (3L, "XYXYXY"))
      .toDF("bench_id", "text")
    val got = SpanDecontaminate.leakReport(
      spark, corpus, bench, "bench_id", "text", SpanDecontaminate.Config(k = 4))
      .orderBy("bench_id").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 3L, 2L), (2L, 5L, 0L), (3L, 2L, 1L)))
  }

  test("over-cap probe set fails loudly") {
    val e = intercept[IllegalArgumentException] {
      run(Seq((1L, "ABCD")), Seq("ABCDEFGH"), SpanDecontaminate.Config(k = 4, maxProbes = 2))
    }
    assert(e.getMessage.contains("probe windows exceed"))
  }
}
