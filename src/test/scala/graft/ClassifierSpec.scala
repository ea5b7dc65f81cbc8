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
