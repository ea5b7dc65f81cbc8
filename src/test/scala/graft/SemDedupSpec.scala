package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SemDedup
import graft.gen.TranscriptGen.mix64

/** SemDeDup operator properties. The q66 oracle (independent Python chain,
  * tools/gen_semdedup_golden.py) pins the end-to-end values at sf0.01; this
  * suite covers the semantics the golden can't isolate: the keeper rule,
  * grouping equivalence to single-cluster brute force, the sub-cell split
  * for over-cap clusters, and kept()'s join shape.
  *
  * Fixture note: where a test NEEDS same-cluster co-location it uses
  * byte-identical copies (identical vectors have identical cosines to every
  * centroid, so the strict-argmax assignment provably co-locates them —
  * and Ivf.train's distinct-init keeps centroids apart). Jittered copies
  * can legitimately straddle two near-identical centroids — that is
  * SemDeDup's documented recall tradeoff, not a bug this suite should
  * encode as flakiness.
  */
class SemDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** `groups` orthogonal base directions, `copies` members each; jitter=0
    * makes members byte-identical, otherwise member c gets c·jitter on one
    * off-axis dim (cos to the group direction stays ≈ 1). */
  private def corpus(groups: Int, copies: Int, jitter: Float = 0f, dim: Int = 16) = {
    val rows = for {
      g <- 0 until groups
      c <- 0 until copies
    } yield {
      val v = Array.tabulate(dim) { d =>
        if (d == g % dim) 1.0f
        else if (jitter != 0f && d == (g + 1) % dim) jitter * c
        else 0.0f
      }
      (g.toLong * 100 + c, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("every duplicate group collapses to one keeper; group_id = min vec_id") {
    val df = corpus(groups = 6, copies = 4)
    val out = SemDedup.dedup(spark, df, k = 6, eps = 0.98).cache()
    assert(out.count() === 24)
    val byGroup = out.groupBy("group_id")
      .agg(count("*").as("n"), sum(when(col("keep"), 1).otherwise(0)).as("kept"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(byGroup.size === 6)
    assert(byGroup.forall { case (_, n, kept) => n == 4 && kept == 1 })
    assert(byGroup.map(_._1).sorted === Seq(0L, 100L, 200L, 300L, 400L, 500L))
    out.unpersist()
  }

  test("keeper is the lowest-centroid-cosine member (vec_id tiebreak on identical)") {
    // k=1: a single cluster (no co-location concerns), centroid = corpus
    // mean, so members further from the group axis score LOWER centroid
    // cosine; jitter 0.02 steps keep raw cos gaps orders of magnitude above
    // the 1e-6 output rounding, so recomputing the argmin from the emitted
    // rounded values is exact
    val df = corpus(groups = 3, copies = 5, jitter = 0.02f)
    val out = SemDedup.dedup(spark, df, k = 1, eps = 0.98)
      .as[(Long, Int, Long, Boolean, Double)].collect()
    assert(out.length === 15)
    out.groupBy(_._3).foreach { case (_, members) =>
      assert(members.length === 5)
      val keeper = members.filter(_._4)
      assert(keeper.length === 1)
      val expect = members.minBy(m => (m._5, m._1))
      assert(keeper.head._1 === expect._1,
        s"keeper ${keeper.head._1} != lowest-centroid-cos member ${expect._1}")
    }
    // identical members (jitter 0): tiebreak must fall to min vec_id
    val tie = SemDedup.dedup(spark, corpus(groups = 2, copies = 3), k = 2, eps = 0.98)
      .filter(col("keep")).select("vec_id").as[Long].collect().sorted
    assert(tie === Array(0L, 100L))
  }

  test("clustered grouping equals single-cluster brute force on separable data") {
    val df = corpus(groups = 5, copies = 3).cache()
    def groupSets(k: Int) =
      SemDedup.dedup(spark, df, k = k, eps = 0.98)
        .select("vec_id", "group_id").as[(Long, Long)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    assert(groupSets(5) === groupSets(1))
    df.unpersist()
  }

  test("over-cap cluster re-clusters into sub-cells; duplicate recall kept") {
    val df = corpus(groups = 4, copies = 8).cache()
    // maxPairwise=5 forces every 8-member cluster into ceil(8/5)=2 cells.
    // r6: over-cap clusters sub-cell by centroid-cos VALUE thresholds
    // instead of hash-splitting — identical vectors have identical
    // cosines, so the value cut provably co-locates each duplicate group
    // (the old hash split scattered them: recall was the documented
    // ~per-cell loss; now it is exact here).
    val out1 = SemDedup.dedup(spark, df, k = 4, eps = 0.98, maxPairwise = 5)
      .as[(Long, Int, Long, Boolean, Double)].collect().sortBy(_._1)
    val out2 = SemDedup.dedup(spark, df, k = 4, eps = 0.98, maxPairwise = 5)
      .as[(Long, Int, Long, Boolean, Double)].collect().sortBy(_._1)
    assert(out1.toSeq === out2.toSeq, "split path must be deterministic")
    // no false merges across cells; one keeper per emitted group
    out1.groupBy(_._3).foreach { case (_, ms) =>
      assert(ms.map(_._1 / 100).distinct.length === 1)
      assert(ms.count(_._4) === 1)
    }
    // full recall for the byte-identical groups: exactly the 4 true groups
    assert(out1.map(_._3).distinct.length === 4)
    df.unpersist()
  }

  test("hash-split fallback (maxReclustered = 0) is the old deterministic tier") {
    val df = corpus(groups = 3, copies = 6).cache()
    val a = SemDedup.dedup(spark, df, k = 3, eps = 0.98, maxPairwise = 4,
      maxReclustered = 0)
      .as[(Long, Int, Long, Boolean, Double)].collect().sortBy(_._1)
    val b = SemDedup.dedup(spark, df, k = 3, eps = 0.98, maxPairwise = 4,
      maxReclustered = 0)
      .as[(Long, Int, Long, Boolean, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "fallback tier must be deterministic")
    // the fallback keeps the documented hash-split recall: emitted groups ==
    // distinct non-empty hash cells each true group's members land in
    val expectedGroups = (0 until 3).map { g =>
      (0 until 6).map(c =>
        java.lang.Math.floorMod(mix64(17L ^ (g * 100 + c)), 2L)).distinct.size
    }.sum
    assert(a.map(_._3).distinct.length === expectedGroups)
    df.unpersist()
  }

  test("kept() left-semi-joins survivors; payload columns preserved") {
    val df = corpus(groups = 3, copies = 2).withColumn("payload", lit("x"))
    val decisions = SemDedup.dedup(spark, df.select("vec_id", "embedding"), k = 3, eps = 0.98)
    val kept = SemDedup.kept(spark, df, decisions)
    assert(kept.count() === 3)
    assert(kept.columns.toSeq === df.columns.toSeq)
    val keepIds = decisions.filter(col("keep")).select("vec_id").as[Long].collect().sorted
    assert(kept.select("vec_id").as[Long].collect().sorted === keepIds)
  }

  test("dedup plan has exactly one Exchange — the (cluster, cell) embedding shuffle") {
    val df = corpus(groups = 3, copies = 2)
    val plan = SemDedup.dedup(spark, df, k = 3, eps = 0.98)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size -
      "ReusedExchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("null embeddings are excluded, not NPE") {
    val df = corpus(groups = 2, copies = 2)
      .union(Seq((999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val out = SemDedup.dedup(spark, df, k = 2, eps = 0.98)
    assert(out.count() === 4)
    assert(out.filter(col("vec_id") === 999L).count() === 0)
  }
}
