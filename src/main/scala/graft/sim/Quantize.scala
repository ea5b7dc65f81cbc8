package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization for similarity search — the memory lever
  * that makes a 100-TB embedding corpus scannable: 4× fewer bytes per
  * vector than float32 (plus one float scale), which is 4× less scan I/O,
  * 4× more vectors per executor page-cache byte, and SIMD-friendly integer
  * dot products.
  *
  * Scheme: symmetric per-vector max-abs scaling — q[i] = round(v[i] / s *
  * 127) with s = max|v[i]|. Cosine over quantized vectors needs NO
  * dequantization: the per-vector scales cancel in the normalized dot
  * product, so scoring is a pure int multiply-accumulate. Quantization is a
  * narrow per-row op (no shuffle); the quantized corpus is written/scanned
  * like any other column.
  *
  * Accuracy contract (tested): int8 cosine ranks within recall ≥ 0.9 of the
  * float32 exact top-k on clustered data; exact re-scoring of the quantized
  * shortlist against float vectors restores exactness when needed (the
  * standard two-stage retrieve-then-rerank shape).
  */
object Quantize {

  /** (quantized bytes, scale). Zero vector keeps scale 0 → all-zero bytes. */
  def quantize(v: Array[Float]): (Array[Byte], Float) = {
    var maxAbs = 0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val out = new Array[Byte](v.length)
    if (maxAbs > 0f) {
      val inv = 127f / maxAbs
      i = 0
      while (i < v.length) { out(i) = math.round(v(i) * inv).toByte; i += 1 }
    }
    (out, maxAbs)
  }

  /** Integer cosine — scales cancel, so this is exact cosine of the
    * QUANTIZED vectors (and ≈ cosine of the originals up to rounding). */
  def cosineQ(a: Array[Byte], b: Array[Byte]): Double = {
    var dotI = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val ai = a(i).toInt; val bi = b(i).toInt
      dotI += ai * bi; na += ai * ai; nb += bi * bi
      i += 1
    }
    val d = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (d == 0.0) 0.0 else dotI / d
  }

  /** Quantized corpus: (vec_id, qvec binary, scale float). */
  def quantizeCorpus(corpus: DataFrame): DataFrame = {
    val qUdf = udf((v: Array[Float]) => quantize(v))
    corpus
      .select(col("vec_id"), qUdf(col("embedding")).as("q"))
      .select(col("vec_id"), col("q._1").as("qvec"), col("q._2").as("scale"))
  }

  /** Sound per-pair error bound for int8 max-abs quantized cosine:
    * |cos(a,b) − cosQ(qa,qb)| ≤ 2·asin(0.5·√d / 127). Derivation: the
    * scale-free image w = v·127/max|v| has ‖w‖ ≥ 127 and rounding moves it
    * by ‖e‖ ≤ 0.5·√d, so each vector's angle shifts by ≤ asin(‖e‖/‖w‖) and
    * cosine is 1-Lipschitz in the angle. */
  def cosineErrorBound(dim: Int): Double =
    2.0 * math.asin(math.min(1.0, 0.5 * math.sqrt(dim.toDouble) / 127.0))

  /** Two-stage retrieve-then-rerank with a SOUNDNESS CERTIFICATE: int8
    * shortlist of k×oversample candidates (quarter-byte scan), exact
    * float32 re-scoring of the tiny shortlist, then a per-query check
    * that the k-th re-scored score strictly beats the best score any
    * non-shortlisted vector could possibly have (its quantized score is ≤
    * the shortlist cutoff, and its true score is within
    * [[cosineErrorBound]] of that). Queries whose margin is too thin fall
    * back to the exact float scan — so the result ALWAYS equals
    * [[Ann.bruteForceTopK]], and the full-corpus float read happens only
    * for the (rare) uncertifiable queries. The float rescore prunes the
    * corpus to the |Q|·k·oversample shortlist via [[idFilter]]: a pushable
    * IN filter while the set is small, a broadcast semi-join beyond that
    * (a 10k-query batch would otherwise embed hundreds of thousands of
    * literals in the plan — driver bloat with no pushdown benefit). */
  def rerankTopK(
      spark: SparkSession,
      corpus: DataFrame, // columns: vec_id, embedding (array<float>)
      queries: Array[(Long, Array[Float])],
      k: Int,
      oversample: Int = 4
  ): DataFrame = {
    if (queries.isEmpty)
      return Ann.bruteForceTopK(spark, corpus, queries, k)
    val short = topKQuantized(
      spark, quantizeCorpus(corpus), queries, k * oversample).collect()
    // worst kept quantized score per query: every OUTSIDE vector scores ≤ it
    val cutoffs = short.groupBy(_.getLong(0))
      .map { case (q, rs) => (q, rs.map(_.getDouble(2)).min) }
    val ids = short.map(_.getLong(1)).distinct.toSeq

    val rescored = Ann.bruteForceTopK(
      spark, idFilter(spark, corpus, ids), queries, k)
      .localCheckpoint(true) // read twice: certificate + result
    val kth = rescored.collect().groupBy(_.getLong(0))
      .map { case (q, rs) => (q, rs.map(_.getDouble(2)).min) }

    // 2e-6 slack: both score columns round to 6 dp before the comparison
    val eps = cosineErrorBound(queries.head._2.length) + 2e-6
    val uncertified = queries.filter { case (qid, _) =>
      kth.getOrElse(qid, Double.NegativeInfinity) <=
        cutoffs.getOrElse(qid, Double.PositiveInfinity) + eps
    }
    if (uncertified.isEmpty) rescored
    else {
      val bad = uncertified.map(_._1).toSet
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"rerank_topk: ${bad.size}/${queries.length} queries below the " +
          s"certificate margin (eps=$eps) — exact float fallback for those")
      val okPart = rescored.filter(!col("query_id").isin(bad.toSeq: _*))
      val fixPart = Ann.bruteForceTopK(spark, corpus, uncertified, k)
      okPart.unionByName(fixPart)
    }
  }

  /** Shortlist restriction of the corpus. Small sets stay a literal IN
    * predicate (pushed to the parquet scan); large sets become a broadcast
    * LEFT SEMI join — O(1) plan size and a hash probe per row instead of a
    * giant In/InSet literal tree. */
  private[graft] def idFilter(
      spark: SparkSession,
      corpus: DataFrame,
      ids: Seq[Long],
      maxInLiterals: Int = 1000
  ): DataFrame =
    if (ids.size <= maxInLiterals) corpus.filter(col("vec_id").isin(ids: _*))
    else {
      import spark.implicits._
      corpus.join(
        broadcast(ids.toDF("vec_id")), Seq("vec_id"), "left_semi")
    }

  /** Exact top-k under int8 cosine: same broadcast-queries + per-partition
    * bounded-heap shape as [[Ann.bruteForceTopK]] — O(corpus) scan at a
    * quarter of the bytes, only |partitions|·|Q|·k rows cross the wire. */
  def topKQuantized(
      spark: SparkSession,
      quantized: DataFrame, // columns: vec_id, qvec (binary), scale
      queries: Array[(Long, Array[Float])],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      queries.map { case (id, v) => (id, quantize(v)._1) })

    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    val partial = quantized
      .select(col("vec_id"), col("qvec"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val qs = qB.value
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
        it.foreach { case (vid, qv) =>
          var qi = 0
          while (qi < qs.length) {
            val score = cosineQ(qs(qi)._2, qv)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((score, vid))
            else if (ord.lt((score, vid), h.head)) { h.dequeue(); h.enqueue((score, vid)) }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, vid) => (qs(qi)._1, vid, s) }
        }
      }
      .toDF("query_id", "vec_id", "score")

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    partial
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"), col("rank"))
  }
}
