package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.KnTrainer

/** Kneser-Ney bigram LM trainer (q68). Hand-computed probabilities on a
  * tiny corpus, the KN mass-conservation identities on a generated one,
  * and token parity with the mode-A (CPython str.split) word spec.
  */
class KnTrainerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // "a b a b a c" + "b a" : bigrams ab,ba,ab,ba? no — within-doc pairs:
  //   doc1: (a,b)(b,a)(a,b)(b,a)(a,c)   doc2: (b,a)
  // c12: (a,b)=2 (b,a)=3 (a,c)=1 ; types=3
  // c1:  a·=3  b·=3 ; n1p_fwd: a=2 b=1 ; n1p_bwd: a=1 b=1 c=1
  private lazy val tiny =
    Seq((1L, "a b a b a c"), (2L, "b a")).toDF("doc_id", "text")

  test("hand-computed counts and P_KN on a tiny corpus") {
    val m = KnTrainer.bigramModel(spark, tiny, "text")
      .orderBy("w1", "w2")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect()
    assert(m.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) === Array(
      ("a", "b", 2L, 3L, 2L, 1L),
      ("a", "c", 1L, 3L, 2L, 1L),
      ("b", "a", 3L, 3L, 1L, 1L)))
    // D=0.75, N1+(..)=3:
    // P(b|a) = (1.25 + 1.5*(1/3))/3 = 1.75/3      = 0.583333
    // P(c|a) = (0.25 + 1.5*(1/3))/3 = 0.75/3      = 0.25
    // P(a|b) = (2.25 + 0.75*(1/3))/3 = 2.5/3      = 0.833333
    assert(m.map(_._7) === Array(0.583333, 0.25, 0.833333))
  }

  test("null/empty/single-token docs contribute no bigrams, no NPE") {
    val df = tiny.union(Seq(
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, "  lone  ")
    ).toDF("doc_id", "text"))
    val m = KnTrainer.bigramModel(spark, df, "text")
    assert(m.agg(sum("c12")).as[Long].head === 6L)
  }

  test("bigrams never cross document boundaries") {
    val joined = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val pairs = KnTrainer.bigramModel(spark, joined, "text")
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs === Set(("x", "y"), ("y", "z"))) // no (y, y)
  }

  test("KN mass identities on a generated corpus") {
    val docs = spark.range(200).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (0 to 6).map(i => concat(lit("w"), pmod($"id" * (i + 3) + i, lit(11)))): _*
      ).as("text"))
    val m = KnTrainer.bigramModel(spark, docs, "text").cache()
    try {
      val nTypes = m.count()
      // sum over distinct w2 of N1+(.w2) == N1+(..)
      val bwdSum = m.select($"w2", $"n1p_bwd").distinct()
        .agg(sum("n1p_bwd")).as[Long].head
      assert(bwdSum === nTypes)
      // per w1: sum(c12) == c1 and row count == n1p_fwd
      val bad = m.groupBy("w1", "c1", "n1p_fwd")
        .agg(sum("c12").as("s"), count(lit(1)).as("n"))
        .where($"s" =!= $"c1" || $"n" =!= $"n1p_fwd")
        .count()
      assert(bad === 0L)
      // interpolated-KN total mass per context: seen mass + reserved
      // backoff mass (D * n1p_fwd / c1) * (1 - seen continuation mass)
      // complement exactly reconstructs to 1 when Pcont sums to 1 over the
      // full vocab; check the seen part matches its closed form.
      val seen = m.groupBy($"w1", $"c1", $"n1p_fwd")
        .agg(sum($"c12".cast("double") - lit(0.75)).as("disc"))
        .select(($"disc" / $"c1".cast("double")).as("massNoBackoff"),
          (lit(1.0) - lit(0.75) * $"n1p_fwd".cast("double") / $"c1".cast("double")).as("expect"))
        .as[(Double, Double)].collect()
      seen.foreach { case (got, exp) => assert(math.abs(got - exp) < 1e-9) }
    } finally { m.unpersist(); () }
  }

  test("token parity: mode-A split (unicode whitespace, no empty tokens)") {
    //   is NOT python-space... it IS: CPython str.split treats U+00A0
    // as whitespace (str.isspace true). Verify KnTrainer.pyTokens agrees
    // with the golden-pinned TextKernels mode-A word COUNT on tricky text.
    val tricky = "a b c  d\tef"
    assert(KnTrainer.pyTokens(tricky).toSeq === Seq("a", "b", "c", "d", "e", "f"))
    assert(KnTrainer.pyTokens("").isEmpty && KnTrainer.pyTokens(null).isEmpty)
  }

  test("incremental update == retrain from scratch (sufficient statistic)") {
    val docs = spark.range(120).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (0 to 7).map(i => concat(lit("w"), pmod($"id" * (i + 2) + i, lit(9)))) :+
          concat(lit("uniq"), pmod($"id", lit(40))): _*).as("text"))
    val base = KnTrainer.countTypes(spark, docs.where($"doc_id" < 70), "text")
    val merged = KnTrainer.updateTypes(spark, base, docs.where($"doc_id" >= 70), "text")
    val inc = KnTrainer.modelFromTypes(spark, merged)
      .orderBy("w1", "w2").collect()
    val full = KnTrainer.bigramModel(spark, docs, "text")
      .orderBy("w1", "w2").collect()
    assert(inc === full)
  }

  test("empty increment is the identity") {
    val base = KnTrainer.countTypes(spark, tiny, "text")
    val merged = KnTrainer.updateTypes(spark, base,
      Seq((9L, "")).toDF("doc_id", "text"), "text")
    assert(KnTrainer.modelFromTypes(spark, merged).orderBy("w1", "w2").collect()
      === KnTrainer.bigramModel(spark, tiny, "text").orderBy("w1", "w2").collect())
  }

  test("trigram model: hand-computed counts and P_KN3 on the tiny corpus") {
    // doc1 trigrams: (a,b,a) (b,a,b) (a,b,a) (b,a,c); doc2 none.
    // c3: (a,b,a)=2 (b,a,b)=1 (b,a,c)=1; T=3
    // ctx (a,b): c_ab=2 n_ab=1; ctx (b,a): c_ab=2 n_ab=2
    // n_bc: (b,a)=1 (a,b)=1 (a,c)=1; n_b_mid: b=1 a=2; n_b_cont: b=1 a=2
    // n_c: a=1 b=1 c=1
    val m = KnTrainer.trigramModel(spark, tiny, "text")
      .orderBy("w1", "w2", "w3")
      .as[(String, String, String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(m.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, r._10)) ===
      Array(
        ("a", "b", "a", 2L, 2L, 1L, 1L, 1L, 1L, 1L),
        ("b", "a", "b", 1L, 2L, 2L, 1L, 2L, 2L, 1L),
        ("b", "a", "c", 1L, 2L, 2L, 1L, 2L, 2L, 1L)))
    // P2(a|b) = (0.25 + 0.75*1*(1/3)) / 1 = 0.5
    // P3(a|ab) = (1.25 + 0.75*1*0.5) / 2 = 0.8125
    // P2(b|a) = P2(c|a) = (0.25 + 0.75*2*(1/3)) / 2 = 0.375
    // P3(b|ba) = P3(c|ba) = (0.25 + 0.75*2*0.375) / 2 = 0.40625
    assert(m.map(_._11) === Array(0.8125, 0.40625, 0.40625))
  }

  test("trigram KN mass identity: discounted seen mass per context") {
    val docs = spark.range(150).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (0 to 7).map(i => concat(lit("w"), pmod($"id" * (i + 3) + i, lit(7)))): _*
      ).as("text"))
    val m = KnTrainer.trigramModel(spark, docs, "text").cache()
    try {
      // per (w1,w2): sum(c3) == c_ab, row count == n_ab; and the seen
      // discounted mass matches 1 - D*n_ab/c_ab (backoff reservation)
      val bad = m.groupBy("w1", "w2", "c_ab", "n_ab")
        .agg(sum("c3").as("s"), count(lit(1)).as("n"),
          sum($"c3".cast("double") - lit(0.75)).as("disc"))
        .where($"s" =!= $"c_ab" || $"n" =!= $"n_ab" ||
          abs($"disc" / $"c_ab".cast("double") -
            (lit(1.0) - lit(0.75) * $"n_ab".cast("double") / $"c_ab".cast("double"))) > lit(1e-9))
        .count()
      assert(bad === 0L)
      // sum of n_bc per w2 == n_b_mid; distinct (w2,w3) count == n_b_cont
      val bad2 = m.select("w2", "w3", "n_bc", "n_b_mid", "n_b_cont").distinct()
        .groupBy("w2", "n_b_mid", "n_b_cont")
        .agg(sum("n_bc").as("s"), count(lit(1)).as("n"))
        .where($"s" =!= $"n_b_mid" || $"n" =!= $"n_b_cont")
        .count()
      assert(bad2 === 0L)
    } finally { m.unpersist(); () }
  }

  test("topK head is the (c12 desc, w1, w2) prefix of the full table") {
    val full = KnTrainer.bigramModel(spark, tiny, "text")
      .orderBy($"c12".desc, $"w1", $"w2").limit(2)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    val top = KnTrainer.bigramModelTop(spark, tiny, "text", topK = 2)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(top === full)
    assert(top.map(r => (r._1, r._2)) === Array(("b", "a"), ("a", "b")))
  }
}
