package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Compressibility

/** Compression-ratio signal (q79): known deflate lengths (pinned against
  * the CPython zlib values), keep-band branches, and the DataFrame pass.
  */
class CompressibilitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("zlen matches the CPython zlib.compress lengths (pinned)") {
    // python3: len(zlib.compress(s.encode(), 6))
    assert(Compressibility.zlen(
      "hello world hello world hello world".getBytes("UTF-8")) === 23L)
    assert(Compressibility.zlen(
      "The quick brown fox jumps over the lazy dog. 1234567890".getBytes("UTF-8")) === 62L)
    assert(Compressibility.zlen(("a" * 40).getBytes("UTF-8")) === 12L)
    assert(Compressibility.zlen("".getBytes("UTF-8")) === 8L) // empty frame
  }

  test("a reused (reset) Deflater gives byte-identical lengths to fresh ones") {
    val d = new java.util.zip.Deflater(6, false)
    val buf = new Array[Byte](65536)
    val inputs = Seq("hello world hello world hello world", "a" * 40, "",
      "mixed content 123 !@# with unicode — ünïcode bits")
      .map(_.getBytes("UTF-8"))
    try inputs.foreach { b =>
      assert(Compressibility.zlenWith(d, buf, b) === Compressibility.zlen(b))
    } finally d.end()
  }

  test("keep band: repetitive fails low, prose passes, tiny docs exempt") {
    // 400 bytes of a single letter compresses to ~15 bytes -> below floor
    val rep = ("z" * 400).getBytes("UTF-8")
    assert(!Compressibility.keep(rep.length.toLong, Compressibility.zlen(rep)))
    val prose = ("It was a bright cold day in April, and the clocks were " +
      "striking thirteen as Winston slipped quickly through the doors.").getBytes("UTF-8")
    assert(Compressibility.keep(prose.length.toLong, Compressibility.zlen(prose)))
    // under MinBytes: exempt even when fully repetitive
    val tiny = ("q" * 40).getBytes("UTF-8")
    assert(Compressibility.keep(tiny.length.toLong, Compressibility.zlen(tiny)))
  }

  test("DataFrame pass: null-safe, partition-invariant") {
    val d = Seq(
      (0L, "x" * 500),
      (1L, null.asInstanceOf[String]),
      (2L, "a perfectly ordinary sentence about nothing in particular, " +
        "long enough to clear the small-document exemption threshold.")
    ).toDF("doc_id", "text")
    val one = Compressibility(spark, d.repartition(1), "text")
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    val many = Compressibility(spark, d.repartition(5), "text")
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    assert(one === many)
    assert(one(0)._4 === false) // repetitive
    assert(one(1) === ((1L, 0L, 8L, true))) // null -> empty, exempt
    assert(one(2)._4 === true)
  }
}
