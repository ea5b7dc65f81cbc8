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

  test("over-budget model fails loudly, never truncates") {
    val e = intercept[IllegalArgumentException] {
      KnScorer.buildModel(KnTrainer.bigramModel(spark, seed, "text"), maxEntries = 2)
    }
    assert(e.getMessage.contains("over the driver-collect budget"))
  }
}
