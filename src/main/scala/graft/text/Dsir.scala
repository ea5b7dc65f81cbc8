package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): estimate two bag-of-hashed-n-gram models — one on a
  * small curated TARGET corpus, one on a sample of the RAW crawl — and
  * weight every raw document by its log importance ratio
  *
  *   log w(x) = Σ_f  c_f(x) · ( log p̂_target(f) − log p̂_raw(f) )
  *
  * over the document's hashed features f (word unigrams + adjacent-pair
  * bigrams, hashed into `b` buckets). High-weight documents look like the
  * target distribution; selection takes the top-k by weight. (Reference
  * analog: none — CorpusAid filters on per-document heuristics only,
  * `src/CorpusAid.py:446-520`; this is the corpus-level selection operator
  * a training-data pipeline adds on top.)
  *
  * Exactness design — the [[KnScorer]] integer micro-nat technique: each
  * bucket's two log-probabilities are quantized ONCE to integer micro-nats
  * (`floor(ln p · 1e6 + 0.5)`, `Math.log` == CPython `math.log` within the
  * quantizer margin) and the per-bucket weight is their Int difference, so
  * a document's weight is a plain Long SUM of bucket weights — associative,
  * partitioning-exact, and replicated bit-for-bit by the independent
  * Python oracle (tools/gen_dsir_golden.py). Bucket probabilities use
  * add-one smoothing over occurrence totals: p̂(f) = (c_f + 1) / (N + b),
  * evaluated in one fixed-order IEEE expression on both sides.
  *
  * Feature hashing is Spark's own `xxhash64` (seed 42): the map pass calls
  * the engine's `XXH64.hashUTF8String` directly, so the bucket assignment
  * is definitionally identical to the built-in column function (a spec
  * asserts this), and the Python oracle reuses the tools' public-spec
  * XXH64 replication (proved bit-exact in the q16/q31 oracles). Bigram
  * features are space-joined; mode-A tokens contain no whitespace, so the
  * join is collision-free.
  *
  * 100-TB shape: both models are `b`-bounded integer arrays (the target
  * corpus is small by construction; the raw model trains on a SAMPLE of
  * the crawl) — the broadcast is ~16 KB at the default b=4096, with no
  * driver-budget concern. Training is one narrow pass per corpus whose
  * only exchange is b-bounded after map-side partial aggregation; scoring
  * the full crawl is one narrow ZERO-SHUFFLE pass. Nothing in the job
  * shuffles document text.
  */
object Dsir {

  /** Default hashed-feature bucket count (the paper's hashed n-gram
    * generative model; 4096 keeps the exchange trivially bounded while
    * collisions stay a modeling choice shared with the oracle). */
  val DefaultBuckets = 4096

  /** `floor(ln(p) * 1e6 + 0.5)` — the canonical micro-nat quantizer
    * ([[KnScorer]]'s oracle contract). */
  private def micro(p: Double): Int =
    math.floor(math.log(p) * 1e6 + 0.5).toInt

  /** Bucket of one feature string: `pmod(xxhash64(feat), b)` — the exact
    * built-in semantics (signed XXH64, seed 42, floored mod). */
  def bucketOf(feature: String, b: Int): Int = {
    val h = XXH64.hashUTF8String(UTF8String.fromString(feature), 42L)
    (((h % b) + b) % b).toInt
  }

  /** Emits the hashed buckets of a document's features — word unigrams
    * then adjacent-pair bigrams, mode-A tokens ([[KnTrainer.pyTokens]]). */
  private def docBuckets(text: String, b: Int): Array[Int] = {
    val ws = KnTrainer.pyTokens(text)
    val n = ws.length
    if (n == 0) return Array.emptyIntArray
    val out = new Array[Int](2 * n - 1)
    var i = 0
    while (i < n) { out(i) = bucketOf(ws(i), b); i += 1 }
    var j = 1
    while (j < n) { out(n + j - 1) = bucketOf(ws(j - 1) + " " + ws(j), b); j += 1 }
    out
  }

  /** One narrow pass over `docs`: per-bucket feature-OCCURRENCE counts as
    * a driver array of length `b` (the only exchange is b-bounded after
    * map-side partial aggregation). */
  def bucketCounts(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      b: Int = DefaultBuckets
  ): Array[Long] = {
    import spark.implicits._
    val rows = docs
      .select(col(textCol))
      .as[String]
      .flatMap(t => docBuckets(t, b))
      .toDF("bucket")
      .groupBy("bucket")
      .agg(count(lit(1)).as("c"))
      .collect()
    val counts = new Array[Long](b)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    counts
  }

  /** Both halves' bucket counts in ONE corpus pass (the q77 setup reads
    * disjoint halves of the same table, so two [[bucketCounts]] calls
    * scan the parquet twice; this flag-keyed aggregation scans once —
    * the exchange is still ≤ 2b rows after map-side partial agg). */
  def bucketCountsPair(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      isTarget: org.apache.spark.sql.Column,
      b: Int = DefaultBuckets
  ): (Array[Long], Array[Long]) = {
    import spark.implicits._
    val rows = docs
      .select(isTarget.cast("boolean").as("t"), col(textCol).as("x"))
      .as[(Boolean, String)]
      .flatMap { case (t, txt) => docBuckets(txt, b).iterator.map(f => (t, f)) }
      .toDF("t", "bucket")
      .groupBy("t", "bucket").agg(count(lit(1)).as("c"))
      .collect()
    val tgt = new Array[Long](b)
    val raw = new Array[Long](b)
    rows.foreach { r =>
      (if (r.getBoolean(0)) tgt else raw)(r.getInt(1)) = r.getLong(2)
    }
    (tgt, raw)
  }

  /** Incremental model maintenance: bucket counts are a SUFFICIENT
    * STATISTIC (plain occurrence sums), so folding an increment is
    * element-wise Long addition over the b-length arrays — update ==
    * retrain exactly, and the existing corpus is never re-read (the
    * KN/BPE incremental pattern). */
  def updateCounts(
      spark: SparkSession,
      prev: Array[Long],
      newDocs: DataFrame,
      textCol: String
  ): Array[Long] = {
    val inc = bucketCounts(spark, newDocs, textCol, prev.length)
    val out = new Array[Long](prev.length)
    var f = 0
    while (f < prev.length) { out(f) = prev(f) + inc(f); f += 1 }
    out
  }

  /** The broadcastable per-bucket weight table:
    * `lam(f) = micro((c_t(f)+1)/(N_t+b)) − micro((c_r(f)+1)/(N_r+b))`. */
  def weightTable(target: Array[Long], raw: Array[Long]): Array[Int] = {
    require(target.length == raw.length, "bucket count mismatch")
    val b = target.length
    val nT = target.sum.toDouble
    val nR = raw.sum.toDouble
    val lam = new Array[Int](b)
    var f = 0
    while (f < b) {
      lam(f) = micro((target(f).toDouble + 1.0) / (nT + b.toDouble)) -
        micro((raw(f).toDouble + 1.0) / (nR + b.toDouble))
      f += 1
    }
    lam
  }

  /** One narrow zero-shuffle pass: (idCol, n_feats, weight_micro) — the
    * log importance weight of every document as a Long micro-nat sum.
    * Empty documents score (0, 0). */
  def score(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      lam: Array[Int],
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val b = lam.length
    val bc = spark.sparkContext.broadcast(lam)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val table = bc.value
        val buckets = docBuckets(text, b)
        var s = 0L
        var i = 0
        while (i < buckets.length) { s += table(buckets(i)); i += 1 }
        (id, buckets.length.toLong, s)
      }
      .toDF(idCol, "n_feats", "weight_micro")
  }

  /** Seeded Gumbel perturbation in integer micro-nats — the RESAMPLING
    * half of DSIR (the paper selects by `log w(x) + Gumbel noise`; plain
    * top-k is the zero-temperature special case). The noise is a pure
    * function of (id, seed): `u = ((xxh64_long(id, seed) >>> 11) + 0.5) ·
    * 2⁻⁵³ ∈ (0,1)` strictly, `g = −ln(−ln u)` quantized once to
    * micro-nats, so the perturbed key `weight_micro + gumbel_micro` is an
    * exact Long — reproducible across runs/cluster sizes and replicated
    * bit-for-bit by the Python oracle (two `ln`s per document — the
    * micro-nat 1-ulp argument). */
  def gumbelMicro(id: Long, seed: Long): Long = {
    val h = XXH64.hashLong(id, seed)
    val u = ((h >>> 11).toDouble + 0.5) * (1.0 / (1L << 53))
    math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
  }

  /** [[score]] plus the seeded Gumbel key: (idCol, n_feats, weight_micro,
    * gumbel_micro, key_micro) — still one narrow zero-shuffle pass. */
  def scoreGumbel(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      lam: Array[Int],
      seed: Long,
      idCol: String = "doc_id"
  ): DataFrame =
    score(spark, docs, textCol, lam, idCol)
      .withColumn("gumbel_micro",
        udf((id: Long) => gumbelMicro(id, seed)).apply(col(idCol)))
      .withColumn("key_micro", col("weight_micro") + col("gumbel_micro"))

  /** Train-on-(`target`, `raw`), weight-`docs` in one call. */
  def trainAndScore(
      spark: SparkSession,
      target: DataFrame,
      raw: DataFrame,
      docs: DataFrame,
      textCol: String,
      b: Int = DefaultBuckets
  ): DataFrame =
    score(spark, docs, textCol,
      weightTable(
        bucketCounts(spark, target, textCol, b),
        bucketCounts(spark, raw, textCol, b)))
}
