package graft.quality

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** Trained document-quality classifier — logistic regression over hashed
  * byte-trigram features, the GPT-3/CCNet pattern (Brown et al. 2020 §A
  * trained a LR quality classifier over hashed features to filter
  * CommonCrawl against a high-quality reference; CCNet keeps per-doc
  * scores the same way). Complements the UNSUPERVISED quality surface
  * ([[Heuristics]] rules, [[Perplexity]] KN scorer, [[LangId]]) with the
  * supervised distillation step a production pipeline runs at the front.
  *
  * Determinism contract (the oracle story, mirroring [[graft.sim.Ivf]]):
  *   - TRAIN on a bounded hash-ordered sample collected to the driver
  *     (production quality classifiers train on 10^4–10^6 labeled docs —
  *     driver-scale by nature; the CORPUS never reaches the driver), with
  *     sequential per-example SGD in sample-hash order: every float op has
  *     a fixed order, so the weights are a pure function of (input, seed).
  *   - The one transcendental (sigmoid's exp) is truncated to float32,
  *     absorbing any JVM-vs-libm ulp difference with probability
  *     ~1-2^-29 per call (the gen_ann_golden.py Box-Muller precedent) —
  *     a mismatch would be a hard oracle red, not silent drift.
  *   - INFER distributed: broadcast weights (nBuckets floats — ~256 KB),
  *     one narrow map over the corpus, no shuffle. The 100-TB path.
  *
  * Features: UTF-8 byte trigrams (language-agnostic, allocation-light,
  * and byte-for-byte replicable outside the JVM — no UTF-16 code-unit
  * coupling), bucket = floorMod(mix64(seed ^ (b0<<16|b1<<8|b2)), nBuckets),
  * value = count / nTrigrams (L1-normalized), dot products accumulated in
  * float64 over ASCENDING bucket index.
  *
  * Re-derived end-to-end by tools/gen_classifier_golden.py (q67 oracle).
  */
object Classifier {

  final case class Config(
      nBuckets: Int = 1 << 16,
      sampleSize: Int = 2048,
      epochs: Int = 3,
      lr: Double = 0.5,
      seed: Long = 29L)

  final case class Model(weights: Array[Double], bias: Double, nBuckets: Int, seed: Long)
    extends Serializable {

    /** sigmoid(w·x + b), sigmoid truncated to float32 (see scaladoc). */
    def score(text: String): Float = {
      val (buckets, values) = Classifier.featurize(text, nBuckets, seed)
      var z = bias
      var i = 0
      while (i < buckets.length) { z += weights(buckets(i)) * values(i); i += 1 }
      (1.0 / (1.0 + math.exp(-z))).toFloat
    }
  }

  /** Sparse L1-normalized byte-trigram counts, bucket indices ascending.
    * Texts shorter than 3 bytes featurize to empty (score = sigmoid(bias)). */
  def featurize(text: String, nBuckets: Int, seed: Long): (Array[Int], Array[Double]) = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val n = bytes.length - 2
    if (n <= 0) return (Array.empty, Array.empty)
    // primitive sort + run-length count (r6: the former TreeMap.merge boxed
    // every trigram — ~5x the CPU of this path); output is bit-identical:
    // ascending bucket indices, count/n values
    val bs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val key = ((bytes(i) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) | (bytes(i + 2) & 0xff)
      bs(i) = java.lang.Math.floorMod(mix64(seed ^ key), nBuckets.toLong).toInt
      i += 1
    }
    java.util.Arrays.sort(bs)
    var distinct = 1
    i = 1
    while (i < n) { if (bs(i) != bs(i - 1)) distinct += 1; i += 1 }
    val ks = new Array[Int](distinct)
    val vs = new Array[Double](distinct)
    var j = 0
    var runStart = 0
    i = 1
    while (i <= n) {
      if (i == n || bs(i) != bs(runStart)) {
        ks(j) = bs(runStart)
        vs(j) = (i - runStart).toDouble / n
        j += 1
        runStart = i
      }
      i += 1
    }
    (ks, vs)
  }

  /** Deterministic driver-side training on a hash-ordered bounded sample of
    * `labeled` (columns: doc_id long, text string, label int 0/1).
    * Sequential SGD in sample order — by the signed mix64(seed ^ doc_id)
    * key, ties impossible in practice and broken by the sort's input order
    * of a deterministic TakeOrdered. */
  def train(spark: SparkSession, labeled: DataFrame, cfg: Config = Config()): Model = {
    import spark.implicits._
    val seed = cfg.seed
    val sample = labeled
      .select(col("doc_id"), col("text"), col("label"))
      .as[(Long, String, Int)]
      .map { case (id, t, y) => (mix64(seed ^ id), t, y) }
      .orderBy(col("_1"))
      .limit(cfg.sampleSize)
      .collect()
    require(sample.nonEmpty, "empty training sample")

    val w = new Array[Double](cfg.nBuckets)
    var b = 0.0
    var e = 0
    while (e < cfg.epochs) {
      sample.foreach { case (_, text, y) =>
        val (ks, vs) = featurize(text, cfg.nBuckets, seed)
        var z = b
        var i = 0
        while (i < ks.length) { z += w(ks(i)) * vs(i); i += 1 }
        val p = (1.0 / (1.0 + math.exp(-z))).toFloat
        val g = p.toDouble - y
        i = 0
        while (i < ks.length) { w(ks(i)) -= cfg.lr * g * vs(i); i += 1 }
        b -= cfg.lr * g
      }
      e += 1
    }
    Model(w, b, cfg.nBuckets, seed)
  }

  /** DISTRIBUTED full-batch logistic training (q86) — the trainer whose
    * training set itself scales: where [[train]] collects a bounded sample
    * to the driver (the production quality-classifier shape), this one
    * computes the exact full-corpus gradient per epoch as a Spark
    * aggregation, so the labeled set can be arbitrarily large.
    *
    * Determinism contract (float sums are order-dependent; Long sums are
    * not): per document the error `err = sigmoid(w·x + b) − y` is computed
    * against the BROADCAST weights (f64 dot in ascending-bucket order,
    * sigmoid truncated to float32 — the [[train]] ulp absorber — and
    * CLAMPED to exact 0/1 beyond |z| > 30: saturated either way, and
    * CPython's `math.exp` raises OverflowError past ~|710| where Java
    * returns Infinity, so the clamp keeps the two sides mechanically
    * identical), and each per-bucket gradient contribution is quantized
    * ONCE to integer micro-units, `floor(err · x_b · 1e6 + 0.5)` (the
    * same IEEE f64 expression on both sides). The corpus gradient is then
    * the exact order-independent Long sum per bucket — the DSIR/BM25
    * integer-sum technique.
    *
    * The driver update is DIAGONALLY PRECONDITIONED by integer document
    * frequency: `w_b −= lr · (g_b / 1e6 / df_b)` in fixed ascending order
    * (df computed once as an exact Long count per bucket). Plain uniform
    * full-batch GD oscillates here — the template vocabulary's shared
    * buckets carry a huge curvature eigenvalue while each negative's
    * hashed-digit buckets are touched by one document, so no single lr
    * both converges the common mode and moves the sparse directions;
    * dividing by df is the standard per-coordinate normalization
    * (AdaGrad's diagonal with counts instead of squared sums — exact in
    * integers, so the oracle survives). The model is a pure function of
    * (input, cfg); the q86 oracle re-derives the whole loop in Python
    * (tools/gen_lrdist_golden.py).
    *
    * Overflow bound: |err| ≤ 1 and Σ_b x_b = 1 (L1-normalized), so one
    * document contributes ≤ ~1e6 across ALL buckets; per-bucket Long sums
    * stay exact to ~9.2e12 documents — past the 10^12-turn target.
    *
    * Shuffle shape: per epoch one narrow pass + a partial-aggregated
    * exchange of ≤ nBuckets+1 rows per partition (the Dsir.bucketCounts
    * pattern), then a (nBuckets+1)-row collect. No corpus shuffle, ever. */
  def trainDistributed(
      spark: SparkSession,
      labeled: DataFrame,
      cfg: Config = Config()): Model = {
    import spark.implicits._
    val seed = cfg.seed
    val nB = cfg.nBuckets
    val data = labeled.select(col("text"), col("label").cast("int"))
      .as[(String, Int)]
    // r6: featurize ONCE and pin the sparse vectors — the former shape
    // re-ran corrupt lineage + featurize on every epoch AND the df pass
    // (epochs+1 full featurize passes); the vectors round-trip exactly
    // through the pin (binary rows), so the gradient arithmetic is
    // bit-identical
    val feats = graft.run.Materialize.pin(
      data.map { case (text, y) =>
        val (ks, vs) = featurize(if (text == null) "" else text, nB, seed)
        (ks, vs, y)
      }.toDF("ks", "vs", "y"))
    val featsDs = feats.as[(Array[Int], Array[Double], Int)]
    val nDocs = feats.count()
    require(nDocs > 0, "empty training set")

    // document frequency per bucket, once: exact Long counts (featurize
    // emits each bucket once per doc), the preconditioner's denominator
    val df = new Array[Long](nB + 1)
    feats
      .select(explode(col("ks")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => df(r.getInt(0)) = r.getLong(1))
    df(nB) = nDocs // the bias slot sees every document

    val w = new Array[Double](nB)
    var b = 0.0
    var e = 0
    while (e < cfg.epochs) {
      val wB = spark.sparkContext.broadcast((w.clone(), b))
      val grads = featsDs
        .flatMap { case (ks, vs, y) =>
          val (ww, bb) = wB.value
          var z = bb
          var i = 0
          while (i < ks.length) { z += ww(ks(i)) * vs(i); i += 1 }
          val p =
            if (z < -30.0) 0f
            else if (z > 30.0) 1f
            else (1.0 / (1.0 + math.exp(-z))).toFloat
          val err = p.toDouble - y
          val out = new Array[(Int, Long)](ks.length + 1)
          i = 0
          while (i < ks.length) {
            out(i) = (ks(i), math.floor(err * vs(i) * 1e6 + 0.5).toLong)
            i += 1
          }
          out(ks.length) = (nB, math.floor(err * 1e6 + 0.5).toLong) // bias slot
          out
        }
        .toDF("bucket", "g")
        .groupBy("bucket").agg(sum(col("g")).as("g"))
        .collect()
      wB.destroy()
      val g = new Array[Long](nB + 1)
      grads.foreach(r => g(r.getInt(0)) = r.getLong(1))
      var k = 0
      while (k < nB) {
        if (df(k) > 0) w(k) -= cfg.lr * (g(k).toDouble / 1e6 / df(k).toDouble)
        k += 1
      }
      b -= cfg.lr * (g(nB).toDouble / 1e6 / df(nB).toDouble)
      e += 1
    }
    feats.unpersist(false)
    Model(w, b, nB, seed)
  }

  /** Distributed scoring: broadcast model, one narrow pass, no shuffle.
    * (idCol, textCol) -> (idCol, extraCols..., score round6, pred) —
    * `extraCols` ride through the projection (the Bpe.encode pass-through
    * pattern) so label columns etc. need no corpus re-join. */
  def score(
      spark: SparkSession,
      docs: DataFrame,
      model: Model,
      idCol: String = "doc_id",
      textCol: String = "text",
      extraCols: Seq[String] = Nil
  ): DataFrame = {
    val mB = spark.sparkContext.broadcast(model)
    val scoreUdf = udf { (t: String) =>
      val s = mB.value.score(if (t == null) "" else t)
      (s.toDouble, s >= 0.5f)
    }
    docs
      .withColumn("_sc", scoreUdf(col(textCol)))
      .select(col(idCol) +: extraCols.map(col) :+
        round(col("_sc._1"), 6).as("score") :+ col("_sc._2").as("pred"): _*)
  }

  /** Deterministic low-quality NEGATIVE for the reference-vs-noise training
    * setup (GPT-3 Appendix A trains its filter on WebText positives vs raw
    * CommonCrawl; with no unfiltered crawl in the sandbox the negative
    * class is synthesized): every 3rd byte position holding an ASCII letter
    * is replaced by a mix64-derived digit. Valid UTF-8 in → valid UTF-8 out
    * (only single-byte ASCII letters are touched), and byte-level so the
    * Python oracle replicates it exactly. */
  def corrupt(docId: Long, text: String): String = {
    val b = text.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (i % 3 == 0 && ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
        b(i) = ('0' + java.lang.Math.floorMod(mix64(docId * 1315423911L ^ i), 10L)).toByte
      i += 1
    }
    new String(b, StandardCharsets.UTF_8)
  }
}
