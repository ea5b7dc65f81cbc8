package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR importance resampling (q77): hash parity with the built-in
  * xxhash64, hand-computed weight-table entries, antisymmetry, scoring
  * branches, and partition invariance of the integer sums.
  */
class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def micro(p: Double): Int =
    math.floor(math.log(p) * 1e6 + 0.5).toInt

  test("bucketOf matches the built-in xxhash64 column exactly") {
    val feats = Seq("a", "hello", "two words", "naïve — ünïcode", "",
      "a somewhat longer feature string that crosses the 32-byte xxh64 block boundary")
    val viaBuiltin = feats.toDF("feat")
      .select(col("feat"), pmod(xxhash64(col("feat")), lit(4096)).cast("int").as("b"))
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    feats.foreach { f =>
      assert(Dsir.bucketOf(f, 4096) === viaBuiltin(f), s"feature '$f'")
    }
  }

  test("weight table carries the hand-computed micro-nat differences") {
    // Single-bucket toy: everything hashes somewhere in B=4096; instead of
    // chasing buckets, feed counts directly.
    val t = new Array[Long](4096); t(7) = 3L
    val r = new Array[Long](4096); r(7) = 1L; r(9) = 2L
    val lam = Dsir.weightTable(t, r)
    assert(lam(7) === micro(4.0 / (3.0 + 4096.0)) - micro(2.0 / (3.0 + 4096.0)))
    assert(lam(9) === micro(1.0 / (3.0 + 4096.0)) - micro(3.0 / (3.0 + 4096.0)))
    // untouched bucket: both sides add-one over equal totals -> 0
    assert(lam(0) === 0)
  }

  test("swapping target and raw negates every weight") {
    val d = Seq((0L, "a b c a"), (1L, "c d"), (2L, "e f g")).toDF("doc_id", "text")
    val ct = Dsir.bucketCounts(spark, d.where(col("doc_id") < 1), "text")
    val cr = Dsir.bucketCounts(spark, d.where(col("doc_id") >= 1), "text")
    val fwd = Dsir.weightTable(ct, cr)
    val bwd = Dsir.weightTable(cr, ct)
    assert(fwd.zip(bwd).forall { case (a, b) => a == -b })
    val sFwd = Dsir.score(spark, d, "text", fwd).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    val sBwd = Dsir.score(spark, d, "text", bwd).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(sFwd.map(_._3) === sBwd.map(x => -x._3))
    // n_feats = 2L-1: "a b c a" -> 7, "c d" -> 3, "e f g" -> 5
    assert(sFwd.map(_._2) === Array(7L, 3L, 5L))
  }

  test("a document drawn from the target outweighs one from the raw side") {
    val target = Seq.tabulate(20)(i => (i.toLong * 2, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = Seq.tabulate(20)(i => (i.toLong * 2 + 1, "zig zag zog boom"))
      .toDF("doc_id", "text")
    val lam = Dsir.weightTable(
      Dsir.bucketCounts(spark, target, "text"),
      Dsir.bucketCounts(spark, raw, "text"))
    val scored = Dsir.score(spark,
      Seq((100L, "alpha beta gamma"), (101L, "zig zag zog")).toDF("doc_id", "text"),
      "text", lam).orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(scored(0)._3 > 0 && scored(1)._3 < 0)
    assert(scored(0)._3 > scored(1)._3)
  }

  test("fused one-pass pair counts == two separate passes") {
    val d = Seq((0L, "a b c a"), (1L, "c d"), (2L, "e f g"), (3L, "a a"))
      .toDF("doc_id", "text")
    val (tgt, raw) = Dsir.bucketCountsPair(spark, d, "text", col("doc_id") % 2 === 0)
    assert(tgt === Dsir.bucketCounts(spark, d.where(col("doc_id") % 2 === 0), "text"))
    assert(raw === Dsir.bucketCounts(spark, d.where(col("doc_id") % 2 =!= 0), "text"))
  }

  test("incremental update == retrain (bucket counts are sufficient)") {
    val d = Seq((0L, "a b c a"), (1L, "c d e f"), (2L, "g h"), (3L, "a a a"))
      .toDF("doc_id", "text")
    val full = Dsir.bucketCounts(spark, d, "text")
    val folded = Dsir.updateCounts(spark,
      Dsir.bucketCounts(spark, d.where(col("doc_id") < 2), "text"),
      d.where(col("doc_id") >= 2), "text")
    assert(full === folded)
  }

  test("gumbel key: strict-interior u, pinned values, seeded determinism") {
    // python3 (tools replication): xxh64(struct.pack('<q', 12345), 7) ->
    // 9005221523427427555; u = ((h>>11)+0.5)*2**-53; floor(-log(-log(u))*1e6+0.5)
    val h = 9005221523427427555L
    val u = ((h >>> 11).toDouble + 0.5) * (1.0 / (1L << 53))
    assert(Dsir.gumbelMicro(12345L, 7L) ===
      math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong)
    // deterministic and seed-sensitive
    assert(Dsir.gumbelMicro(42L, 7L) === Dsir.gumbelMicro(42L, 7L))
    assert(Dsir.gumbelMicro(42L, 7L) !== Dsir.gumbelMicro(42L, 8L))
  }

  test("scoreGumbel = score + exact Long key; partition-invariant") {
    val d = Seq((0L, "a b c"), (1L, "c d e"), (2L, "f g")).toDF("doc_id", "text")
    val lam = Dsir.weightTable(
      Dsir.bucketCounts(spark, d.where(col("doc_id") === 0), "text"),
      Dsir.bucketCounts(spark, d.where(col("doc_id") =!= 0), "text"))
    val one = Dsir.scoreGumbel(spark, d.repartition(1), "text", lam, seed = 7L)
      .orderBy("doc_id").collect()
    val many = Dsir.scoreGumbel(spark, d.repartition(5), "text", lam, seed = 7L)
      .orderBy("doc_id").collect()
    assert(one === many)
    one.foreach { r =>
      assert(r.getAs[Long]("key_micro") ===
        r.getAs[Long]("weight_micro") + r.getAs[Long]("gumbel_micro"))
      assert(r.getAs[Long]("gumbel_micro") ===
        Dsir.gumbelMicro(r.getAs[Long]("doc_id"), 7L))
    }
  }

  test("null / empty docs score (0, 0) and weights are partition-invariant") {
    val d = Seq((0L, "a b c a b"), (1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val lam = Dsir.weightTable(
      Dsir.bucketCounts(spark, d, "text"),
      Dsir.bucketCounts(spark, d.where(col("doc_id") === 0), "text"))
    val one = Dsir.score(spark, d.repartition(1), "text", lam)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val many = Dsir.score(spark, d.repartition(7), "text", lam)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(one === many)
    assert(one(1) === ((1L, 0L, 0L)) && one(2) === ((2L, 0L, 0L)))
  }
}
