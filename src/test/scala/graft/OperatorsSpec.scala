package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.NgramJaccard
import graft.operators.{AsOfJoin, RangeJoin}

/** Brute-force equivalence proofs for the relational extension operators
  * (as-of join, banded range join, n-gram Jaccard similarity join). */
class OperatorsSpec extends AnyFunSuite with SparkTestBase {

  private def rng = new graft.gen.TranscriptGen.Rng(4242L)

  test("AsOfJoin matches the brute-force latest-at-or-before lookup") {
    import spark.implicits._
    val r = rng
    // left events and right states over a handful of keys, with deliberate
    // equal-timestamp collisions (inclusive-<= edge) and keys with no match
    val left = (0 until 300).map(i =>
      (i.toLong, (r.nextInt(8)).toLong, r.nextInt(100).toLong))  // (id, key, t)
    val right = (0 until 120).map(i =>
      ((r.nextInt(6)).toLong, r.nextInt(100).toLong, 1000L + i)) // (key, t, payload)
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq    // unique (key,t)

    val got = AsOfJoin.join(
      left.toDF("id", "k", "t"), right.toDF("k", "rt", "state"),
      key = Seq("k"), leftTime = "t", rightTime = "rt", payload = Seq("state"))
      .select("id", "asof_time", "state")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap

    left.foreach { case (id, k, t) =>
      val best = right.filter(x => x._1 == k && x._2 <= t)
        .sortBy(x => (x._2, x._3)).lastOption
      assert(got(id) === ((best.map(_._2), best.map(_._3))),
        s"left row $id (k=$k, t=$t)")
    }
  }

  test("AsOfJoin tolerance nulls out matches older than the window") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L)).toDF("id", "k", "t")
    val right = Seq((1L, 95L, 7L)).toDF("k", "rt", "state")
    val got = AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("state"),
      tolerance = Some(10L))
      .select("id", "state").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(7L))   // 100 - 95 = 5 <= 10
    assert(got(2L) === None)       // 200 - 95 = 105 > 10
  }

  test("AsOfJoin plans a single shuffle (no range cross-product)") {
    import spark.implicits._
    val left = (0 until 100).map(i => (i.toLong, i.toLong % 5, i.toLong)).toDF("id", "k", "t")
    val right = (0 until 50).map(i => (i.toLong % 5, i.toLong * 2, i.toLong)).toDF("k", "rt", "state")
    val plan = AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected ONE shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("RangeJoin matches the brute-force interval-point join") {
    import spark.implicits._
    val r = rng
    val intervals = (0 until 80).map { i =>
      val lo = r.nextInt(1000).toLong - 200
      (i.toLong, lo, lo + r.nextInt(150).toLong)  // negative los exercise floor-banding
    }
    val points = (0 until 400).map(i => (1000L + i, r.nextInt(1200).toLong - 300))

    val got = RangeJoin.pointsInRanges(
      intervals.toDF("iid", "lo", "hi"), points.toDF("pid", "pt"),
      "lo", "hi", "pt", bandWidth = 100L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet

    val expected = (for {
      (iid, lo, hi) <- intervals
      (pid, pt) <- points
      if pt >= lo && pt <= hi
    } yield (iid, pid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("RangeJoin plans equi-join on the band (no nested loop)") {
    import spark.implicits._
    val intervals = (0 until 50).map(i => (i.toLong, i * 10L, i * 10L + 25L)).toDF("iid", "lo", "hi")
    val points = (0 until 200).map(i => (i.toLong, i * 3L)).toDF("pid", "pt")
    val plan = RangeJoin.pointsInRanges(intervals, points, "lo", "hi", "pt", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded join must not fall back to a nested loop:\n$plan")
  }

  test("RangeJoin fails fast on corrupt intervals (lo > hi, outlier span)") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "pt")
    // lo > hi: a silent descending sequence would just drop matches
    val inverted = Seq((1L, 100L, 10L)).toDF("iid", "lo", "hi")
    val e1 = intercept[Exception] {
      RangeJoin.pointsInRanges(inverted, points, "lo", "hi", "pt", 50L).collect()
    }
    assert(e1.getMessage.contains("range_join"), e1.getMessage)
    // one outlier interval spanning millions of bands would build a
    // per-row array that kills the whole job obscurely
    val outlier = Seq((1L, 0L, 9000000000000000L)).toDF("iid", "lo", "hi")
    val e2 = intercept[Exception] {
      RangeJoin.pointsInRanges(outlier, points, "lo", "hi", "pt", 100L).collect()
    }
    assert(e2.getMessage.contains("maxBandsPerInterval"), e2.getMessage)
  }

  test("AsOfJoin rejects output-column collisions (chained joins)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 99L)).toDF("k", "t", "asof_time")
    val right = Seq((1L, 5L, "x")).toDF("k", "rt", "pay")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("pay"))
    }
    assert(e.getMessage.contains("asof_time"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.NgramJaccard.similarPairs(spark,
        Seq((1L, "a b")).toDF("id", "text"), n = 0)
    }
    assert(e2.getMessage.contains("n must be >= 1"), e2.getMessage)
  }

  test("NgramJaccard matches the brute-force string-set pairs exactly") {
    import spark.implicits._
    val r = rng
    val bases = (0 until 40).map(_ =>
      (0 until 30).map(_ => s"w${r.nextInt(60)}").mkString(" "))
    var id = -1L
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      val vs = scala.collection.mutable.ArrayBuffer(b)
      if (i % 2 == 0) vs += b.split(" ").updated(3, "mutated").mkString(" ") // near-dup
      if (i % 9 == 0) vs += "short"                                         // < n tokens
      if (i % 11 == 0) vs += "   "                                          // blank
      vs.map { v => id += 1; (id, v) }
    }
    val expected = NgramJaccard.bruteForcePairs(docs, n = 2, tau = 0.5)
      .map(p => (p._1, p._2) -> math.rint(p._3 * 1e6) / 1e6).toMap
    assert(expected.nonEmpty, "corpus must contain similar pairs")

    // both verify strategies (broadcast map-side / candidate-join shuffle)
    // must reproduce the brute force exactly
    for (budget <- Seq(256L << 20, 0L)) {
      val got = NgramJaccard.similarPairs(spark, docs.toDF("id", "text"),
        n = 2, tau = 0.5, maxBroadcastBytes = budget)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      assert(got === expected, s"maxBroadcastBytes=$budget")
    }
    // and across the parameter space (prefix-length arithmetic, length
    // filter, and first-shared-gram ownership must hold for any n / tau)
    for ((n, tau) <- Seq((1, 0.3), (3, 0.7), (2, 0.9)); budget <- Seq(256L << 20, 0L)) {
      val exp = NgramJaccard.bruteForcePairs(docs, n, tau)
        .map(p => (p._1, p._2) -> math.rint(p._3 * 1e6) / 1e6).toMap
      val got = NgramJaccard.similarPairs(spark, docs.toDF("id", "text"),
        n = n, tau = tau, maxBroadcastBytes = budget)
        .as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      assert(got === exp, s"n=$n tau=$tau budget=$budget")
    }
  }

  test("NgramJaccard prefix filter drops nothing vs full-index candidates") {
    // tau=0.5 with heavy mutation density — if the prefix-length formula
    // were off by one the brute-force equality above could still pass by
    // luck on easy pairs; this pins a borderline pair at jaccard ~ tau
    val a = (0 until 21).map(i => s"t$i").mkString(" ")             // 20 bigrams
    val b = ((0 until 14).map(i => s"t$i") ++ (0 until 7).map(i => s"x$i")).mkString(" ")
    val docs = Seq((0L, a), (1L, b))
    val brute = NgramJaccard.bruteForcePairs(docs, 2, 0.4)
    val got = NgramJaccard.similarPairs(spark,
      { import spark.implicits._; docs.toDF("id", "text") }, n = 2, tau = 0.4)
      .collect()
    assert(got.length === brute.length)
  }

  test("group quantiles: percentile interpolation matches the spec formula") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val got = vals.toDF("v").agg(percentile(col("v"), lit(0.95))).head().getDouble(0)
    // index = 0.95 * (n-1) = 3.8 → 4 + 0.8 * (10 - 4)
    assert(math.abs(got - 8.8) < 1e-9)
  }
}
