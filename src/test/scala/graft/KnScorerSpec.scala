package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{KnScorer, KnTrainer}

/** KN scorer (q69): hand-computed micro-nat scores covering every
  * seen/backoff/OOV branch, integer-sum partition invariance, the CCNet
  * train-A-score-B composition, and the loud over-budget guard.
  */
class KnScorerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Training corpus (KnTrainerSpec's tiny): bigram types (a,b)=2 (b,a)=3
  // (a,c)=1; c1: a=3 b=3; n1p_fwd: a=2 b=1; n1p_bwd: a=1 b=1 c=1; nAll=3.
  private lazy val seed =
    Seq((0L, "a b a b a c"), (2L, "b a")).toDF("doc_id", "text")

  private def micro(p: Double): Long =
    math.floor(math.log(p) * 1e6 + 0.5).toLong

  private lazy val model =
    KnScorer.buildModel(KnTrainer.bigramModel(spark, seed, "text"))

  test("model tables carry the hand-computed micro-nats") {
    // unrounded P_KN: (b|a)=1.75/3, (c|a)=0.75/3, (a|b)=2.5/3
    assert(model.pair.get("a").get("b").longValue === micro((1.25 + (0.75 * 2.0) * (1.0 / 3.0)) / 3.0))
    assert(model.pair.get("a").get("c").longValue === micro((0.25 + (0.75 * 2.0) * (1.0 / 3.0)) / 3.0))
    assert(model.pair.get("b").get("a").longValue === micro((2.25 + (0.75 * 1.0) * (1.0 / 3.0)) / 3.0))
    assert(model.ctx.get("a").longValue === micro((0.75 * 2.0) / 3.0))
    assert(model.ctx.get("b").longValue === micro((0.75 * 1.0) / 3.0))
    assert(model.cont.get("c").longValue === micro(1.0 / 3.0))
    assert(model.unkMicro.toLong === micro(1.0 / 4.0))
  }

  test("every scoring branch, hand-accumulated") {
    // "a b q c a z": (a,b) seen pair; (b,q) seen ctx + unk cont;
    // (q,c) unseen ctx + seen cont; (c,a) unseen ctx + seen cont;
    // (a,z) seen ctx + unk cont.
    val got = KnScorer.score(spark, Seq((7L, "a b q c a z")).toDF("doc_id", "text"),
      "text", model).as[(Long, Long, Long, Long)].head()
    val expected =
      model.pair.get("a").get("b").longValue +
        (model.ctx.get("b").longValue + model.unkMicro.toLong) +
        model.cont.get("c").longValue +
        model.cont.get("a").longValue +
        (model.ctx.get("a").longValue + model.unkMicro.toLong)
    assert(got === ((7L, 5L, 4L, expected)))
  }

  test("null / empty / single-token docs score (0, 0, 0)") {
    val got = KnScorer.score(spark,
      Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, " lone ")).toDF("doc_id", "text"),
      "text", model).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L)))
  }

  test("scores are partitioning-invariant (integer micro-nat sums)") {
    val docs = spark.range(300).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (0 to 9).map(i => concat(lit("w"), pmod($"id" * (i + 2) + i, lit(13)))) :+
          concat(lit("uniq"), $"id"): _* // doc-unique token → real OOV bigrams
      ).as("text"))
    val m = KnScorer.buildModel(
      KnTrainer.bigramModel(spark, docs.where($"doc_id" % 3 === 0), "text"))
    val a = KnScorer.score(spark, docs.repartition(1), "text", m)
      .orderBy("doc_id").collect()
    val b = KnScorer.score(spark, docs.repartition(17), "text", m)
      .orderBy("doc_id").collect()
    assert(a === b)
    assert(a.exists(_.getLong(2) > 0)) // OOV branches actually exercised
  }

  test("trainAndScore composes; self-scored training corpus has zero OOV") {
    val got = KnScorer.trainAndScore(spark, seed, seed, "text")
      .agg(sum("n_oov"), sum("n_bigrams")).as[(Long, Long)].head()
    assert(got === ((0L, 6L)))
  }

  test("distributed join tier == broadcast tier, every branch, bit-equal") {
    // the branch-battery doc plus empty/single-token docs (the left-join
    // zero-fill path), scored by both tiers against the same model table
    val crawl = Seq((7L, "a b q c a z"), (8L, ""), (9L, " lone "),
      (10L, null.asInstanceOf[String]), (11L, "a b a b a c")).toDF("doc_id", "text")
    val modelDf = KnTrainer.bigramModel(spark, seed, "text")
    val broadcastTier = KnScorer.score(spark, crawl, "text",
      KnScorer.buildModel(modelDf)).orderBy("doc_id").collect()
    val joinTier = KnScorer.scoreJoin(spark, crawl, "text", modelDf)
      .orderBy("doc_id").collect()
    assert(broadcastTier === joinTier)
  }

  test("trainAndScore degrades to the join tier over budget, value-exactly") {
    val crawl = Seq((7L, "a b q c a z"), (8L, "b a b a")).toDF("doc_id", "text")
    val inBudget = KnScorer.trainAndScore(spark, seed, crawl, "text")
      .orderBy("doc_id").collect()
    val forcedJoin = KnScorer.trainAndScore(spark, seed, crawl, "text",
      maxEntries = 1L) // 3 bigram types > 1 → the distributed tier
      .orderBy("doc_id").collect()
    assert(inBudget === forcedJoin)
  }

  test("trigram join tier == broadcast tier, every backoff branch, bit-equal") {
    val crawl = Seq((7L, "a b a b q a b a c z c"), (8L, ""), (9L, "x y"),
      (10L, null.asInstanceOf[String]), (11L, "a b a b a c")).toDF("doc_id", "text")
    val modelDf = KnTrainer.trigramModel(spark, seed, "text")
    val broadcastTier = KnScorer.scoreTri(spark, crawl, "text",
      KnScorer.buildTriModel(modelDf)).orderBy("doc_id").collect()
    val joinTier = KnScorer.scoreTriJoin(spark, crawl, "text", modelDf)
      .orderBy("doc_id").collect()
    assert(broadcastTier === joinTier)
    val forced = KnScorer.trainAndScoreTri(spark, seed, crawl, "text",
      maxEntries = 1L).orderBy("doc_id").collect()
    assert(broadcastTier === forced)
  }

  test("CCNet tercile path (GroupedRank + ntileExpr) equals a global ntile window") {
    val docs = spark.range(90).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (0 to 5).map(i => concat(lit("w"), pmod($"id" * (i + 2) + i, lit(7)))) :+
          concat(lit("uniq"), $"id"): _*).as("text"))
    val m = KnScorer.buildModel(
      KnTrainer.bigramModel(spark, docs.where($"doc_id" % 2 === 0), "text"))
    val scored = KnScorer.score(spark, docs, "text", m)
      .where($"n_bigrams" > 0)
      .withColumn("mm", $"score_micro".cast("double") / $"n_bigrams".cast("double"))
    val viaRank = graft.sample.GroupedRank.rank(
      spark, scored, lit(0), Seq($"mm".desc, $"doc_id"))
      .withColumn("t", graft.sample.GroupedRank.ntileExpr(
        $"group_rank", $"group_count", 3).cast("int"))
      .select("doc_id", "t").orderBy("doc_id").collect()
    val w = org.apache.spark.sql.expressions.Window.orderBy($"mm".desc, $"doc_id")
    val viaWindow = scored.withColumn("t", ntile(3).over(w))
      .select("doc_id", "t").orderBy("doc_id").collect()
    assert(viaRank === viaWindow)
  }

  test("trigram scorer: every backoff branch, hand-accumulated") {
    // train on tiny: trigram types (a,b,a)x2 (b,a,b) (b,a,c); T=3.
    val tm = KnScorer.buildTriModel(KnTrainer.trigramModel(spark, seed, "text"))
    // "a b a b q a b a c z c": trigrams and branches —
    //  (a,b,a) seen tri; (b,a,b) seen tri; (a,b,q) ctx3(a b) + [pair2(b q)?
    //  no → ctx2(b) + cont1(q)? q unseen → unk]; (b,q,a) no ctx3, pair2(q a)?
    //  no, ctx2(q)? no → cont1(a); (q,a,b) no ctx3 → pair2(a b) seen;
    //  (a,b,a) seen tri; (b,a,c) seen tri; (a,c,z) no ctx3 → pair2(c z)? no,
    //  ctx2(c)? no → cont1(z)? no → unk; (c,z,c) no ctx3 → ctx2(z)? no →
    //  cont1(c) seen.
    val got = KnScorer.scoreTri(spark,
      Seq((5L, "a b a b q a b a c z c")).toDF("doc_id", "text"), "text", tm)
      .as[(Long, Long, Long, Long)].head()
    def g(m: java.util.HashMap[String, java.lang.Integer], k: String): Long = {
      val v = m.get(k); assert(v != null, s"expected $k in model"); v.longValue
    }
    val expected =
      g(tm.tri, "a b a") + g(tm.tri, "b a b") +
        (g(tm.ctx3, "a b") + (g(tm.ctx2, "b") + tm.unkMicro.toLong)) +
        g(tm.cont1, "a") +
        g(tm.pair2, "a b") +
        g(tm.tri, "a b a") + g(tm.tri, "b a c") +
        tm.unkMicro.toLong +
        g(tm.cont1, "c")
    assert(got === ((5L, 9L, 5L, expected)))
  }

  test("trigram scorer: self-scored training corpus has zero OOV; short docs zero") {
    val scored = KnScorer.trainAndScoreTri(spark,
      seed, seed.union(Seq((9L, "x y")).toDF("doc_id", "text")), "text")
    val got = scored.orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(got.filter(_._1 == 9L) === Array((9L, 0L, 0L, 0L)))
    assert(got.map(_._3).sum === 0L)
    assert(got.filter(_._1 == 0L).head._2 === 4L) // doc 0 has 4 trigrams
  }

  test("over-budget model fails loudly, never truncates") {
    val e = intercept[IllegalArgumentException] {
      KnScorer.buildModel(KnTrainer.bigramModel(spark, seed, "text"), maxEntries = 2)
    }
    assert(e.getMessage.contains("over the driver-collect budget"))
  }
}
