package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Classifier

/** Trained quality classifier properties. The q67 oracle (independent
  * Python chain, tools/gen_classifier_golden.py) pins end-to-end values at
  * sf0.01; this suite covers the operator semantics in isolation.
  */
class ClassifierSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def labeledCorpus(n: Int) = {
    val pos = (0 until n).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i and then rests", 1))
    val neg = (0 until n).map(i =>
      (i.toLong + 1000000L, Classifier.corrupt(i.toLong, pos(i)._2), 0))
    (pos ++ neg).toDF("doc_id", "text", "label")
  }

  test("separates reference from corrupted noise (train-set accuracy >= 0.95)") {
    val labeled = labeledCorpus(200).cache()
    val model = Classifier.train(spark, labeled)
    val scored = Classifier.score(spark, labeled, model, extraCols = Seq("label"))
    val (correct, total) = {
      val r = scored.agg(
        sum(when(col("pred") === (col("label") === 1), 1).otherwise(0)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(total === 400)
    assert(correct.toDouble / total >= 0.95, s"accuracy ${correct.toDouble / total}")
    labeled.unpersist()
  }

  test("training is deterministic: same corpus + seed -> identical weights") {
    val labeled = labeledCorpus(50).cache()
    val m1 = Classifier.train(spark, labeled)
    val m2 = Classifier.train(spark, labeled)
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq)
    labeled.unpersist()
  }

  test("corrupt(): deterministic, valid UTF-8, only every-3rd ASCII letter touched") {
    val t = "Hello wörld — naïve café ABC123 xyz"
    val c1 = Classifier.corrupt(7L, t)
    val c2 = Classifier.corrupt(7L, t)
    assert(c1 === c2)
    assert(c1 !== t)
    assert(Classifier.corrupt(8L, t) !== c1, "doc_id must vary the corruption")
    val ob = t.getBytes("UTF-8"); val cb = c1.getBytes("UTF-8")
    assert(ob.length === cb.length, "corruption is byte-length preserving")
    ob.zip(cb).zipWithIndex.foreach { case ((o, c), i) =>
      if (o != c) {
        assert(i % 3 === 0)
        assert((o >= 'A' && o <= 'Z') || (o >= 'a' && o <= 'z'))
        assert(c >= '0' && c <= '9')
      }
    }
    // round-trips cleanly through UTF-8 (multi-byte sequences untouched)
    assert(new String(c1.getBytes("UTF-8"), "UTF-8") === c1)
  }

  test("featurize: L1-normalized, ascending buckets, short/empty texts empty") {
    val (ks, vs) = Classifier.featurize("abcabc", 1 << 16, 29L)
    assert(ks.toSeq === ks.sorted.toSeq)
    assert(math.abs(vs.sum - 1.0) < 1e-12)
    assert(Classifier.featurize("ab", 1 << 16, 29L)._1.isEmpty)
    assert(Classifier.featurize("", 1 << 16, 29L)._1.isEmpty)
  }

  test("scoring plan is a single narrow pass — no Exchange") {
    val labeled = labeledCorpus(20)
    val model = Classifier.train(spark, labeled)
    val plan = Classifier.score(spark, labeled, model, extraCols = Seq("label"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in scoring plan:\n$plan")
  }

  test("distributed full-batch trainer separates the classes (accuracy >= 0.95)") {
    val labeled = labeledCorpus(200).cache()
    val model = Classifier.trainDistributed(spark, labeled,
      Classifier.Config(epochs = 3, lr = 5000.0))
    val scored = Classifier.score(spark, labeled, model, extraCols = Seq("label"))
    val r = scored.agg(
      sum(when(col("pred") === (col("label") === 1), 1).otherwise(0)),
      count(lit(1))).head()
    assert(r.getLong(1) === 400)
    assert(r.getLong(0).toDouble / r.getLong(1) >= 0.95,
      s"accuracy ${r.getLong(0).toDouble / r.getLong(1)}")
    labeled.unpersist()
  }

  test("distributed gradients are partition-order independent: bit-equal weights at 3 vs 17 partitions") {
    val labeled = labeledCorpus(60)
    val cfg = Classifier.Config(epochs = 2, lr = 5000.0)
    val m1 = Classifier.trainDistributed(spark, labeled.repartition(3), cfg)
    val m2 = Classifier.trainDistributed(spark, labeled.repartition(17), cfg)
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq)
  }

  test("distributed trainer == sequential driver replay, bit-equal (the oracle's contract)") {
    val labeled = labeledCorpus(40)
    val cfg = Classifier.Config(epochs = 2, lr = 5000.0)
    val dist = Classifier.trainDistributed(spark, labeled, cfg)

    // independent single-threaded replay of the published contract
    val rows = labeled.select("text", "label").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val nB = cfg.nBuckets
    val feats = rows.map { case (t, y) => (Classifier.featurize(t, nB, cfg.seed), y) }
    val df = new Array[Long](nB + 1)
    feats.foreach { case ((ks, _), _) => ks.foreach(k => df(k) += 1) }
    df(nB) = rows.length.toLong
    val w = new Array[Double](nB)
    var bias = 0.0
    (1 to cfg.epochs).foreach { _ =>
      val g = new Array[Long](nB + 1)
      feats.foreach { case ((ks, vs), y) =>
        var z = bias
        var i = 0
        while (i < ks.length) { z += w(ks(i)) * vs(i); i += 1 }
        val p = if (z < -30.0) 0f else if (z > 30.0) 1f
          else (1.0 / (1.0 + math.exp(-z))).toFloat
        val err = p.toDouble - y
        i = 0
        while (i < ks.length) {
          g(ks(i)) += math.floor(err * vs(i) * 1e6 + 0.5).toLong; i += 1
        }
        g(nB) += math.floor(err * 1e6 + 0.5).toLong
      }
      var k = 0
      while (k < nB) {
        if (df(k) > 0) w(k) -= cfg.lr * (g(k).toDouble / 1e6 / df(k).toDouble)
        k += 1
      }
      bias -= cfg.lr * (g(nB).toDouble / 1e6 / df(nB).toDouble)
    }
    assert(dist.bias === bias)
    assert(dist.weights.toSeq === w.toSeq)
  }

  test("null and sub-trigram texts score at sigmoid(bias), no NPE") {
    val labeled = labeledCorpus(20)
    val model = Classifier.train(spark, labeled)
    val odd = Seq((1L, null.asInstanceOf[String], 0), (2L, "ab", 0))
      .toDF("doc_id", "text", "label")
    val out = Classifier.score(spark, odd, model).collect()
    assert(out.length === 2)
    val expect = BigDecimal((1.0 / (1.0 + math.exp(-model.bias))).toFloat.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach(r => assert(r.getDouble(1) === expect))
  }
}
