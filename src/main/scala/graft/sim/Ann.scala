package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force exact top-k is the baseline: broadcast the (small) query set,
  * scan the corpus once with a per-partition bounded heap per query, merge
  * heaps — no crossJoin shuffle, O(corpus) work, O(|Q|·k) state. This is the
  * pattern that survives a 100× corpus scale-up (queries stay broadcastable;
  * the scan parallelizes; only k·|Q| rows cross the wire).
  *
  * The scale path is random-hyperplane LSH (sign-bit bucketing): corpus
  * bucketed once by an nBits-bit signature; queries probe their own bucket
  * plus all 1-bit-flip neighbors (multi-probe) — recall measured against the
  * exact baseline in tests.
  */
object Ann {

  @inline def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  @inline def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }

  final case class Neighbor(query_id: Long, vec_id: Long, score: Double)

  /** Exact cosine top-k of each query vector against the corpus.
    * Deterministic tie-break: higher score first, then lower vec_id. */
  def bruteForceTopK(
      spark: SparkSession,
      corpus: DataFrame, // columns: vec_id (long), embedding (array<float>)
      queries: Array[(Long, Array[Float])],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      queries.map { case (id, v) => (id, v, norm(v)) })

    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    val partial = corpus
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qB.value
        // per-query bounded "worst-first" buffers
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
        it.foreach { case (vid, emb) =>
          val en = norm(emb)
          var qi = 0
          while (qi < qs.length) {
            val (_, qv, qn) = qs(qi)
            val denom = en * qn
            val score = if (denom == 0.0) 0.0 else dot(qv, emb) / denom
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

    // global merge: tiny (|partitions| * |Q| * k rows)
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    partial
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** Random hyperplanes from the seed (deterministic, Box-Muller over
    * splitmix64). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Float]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        val u1 = ((mix64(seed ^ (b * 1000003L + d)) >>> 11) + 1.0) * (1.0 / (1L << 53))
        val u2 = ((mix64(seed ^ (d * 7919L + b) ^ 0x5851f42dL) >>> 11) + 1.0) * (1.0 / (1L << 53))
        (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
      }
    }

  def signatureOf(v: Array[Float], planes: Array[Array[Float]]): Int = {
    var sig = 0
    var b = 0
    while (b < planes.length) {
      if (dot(v, planes(b)) >= 0.0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed ANN: bucket the corpus by hyperplane signature; each query
    * probes its bucket + all 1-bit flips. Returns the same schema as
    * [[bruteForceTopK]]; recall < 1 by construction. */
  def lshTopK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nBits: Int = 10,
      seed: Long = 13L
  ): DataFrame = {
    import spark.implicits._
    val dim = queries.headOption.map(_._2.length).getOrElse(0)
    val planes = hyperplanes(nBits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)

    // query probe set: own signature + 1-bit flips
    val probes: Map[Int, Array[(Long, Array[Float], Double)]] = {
      val m = scala.collection.mutable.Map.empty[Int, List[(Long, Array[Float], Double)]]
      queries.foreach { case (qid, qv) =>
        val s = signatureOf(qv, planes)
        (s :: (0 until nBits).map(b => s ^ (1 << b)).toList).foreach { sig =>
          m(sig) = (qid, qv, norm(qv)) :: m.getOrElse(sig, Nil)
        }
      }
      m.map { case (s, l) => s -> l.toArray }.toMap
    }
    val probesB = spark.sparkContext.broadcast(probes)

    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    val partial = corpus
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pr = probesB.value
        val pl = planesB.value
        val acc = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (vid, emb) =>
          val sig = signatureOf(emb, pl)
          pr.get(sig).foreach { qs =>
            val en = norm(emb)
            qs.foreach { case (qid, qv, qn) =>
              val denom = en * qn
              val score = if (denom == 0.0) 0.0 else dot(qv, emb) / denom
              val h = acc.getOrElseUpdate(qid,
                new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
              if (h.size < k) h.enqueue((score, vid))
              else if (ord.lt((score, vid), h.head)) { h.dequeue(); h.enqueue((score, vid)) }
            }
          }
        }
        acc.iterator.flatMap { case (qid, h) => h.iterator.map { case (s, v) => (qid, v, s) } }
      }
      .toDF("query_id", "vec_id", "score")

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    partial
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs scoring
    * >= minCosine, compared only within a signature bucket (plus 1-bit
    * neighbor buckets via signature replication). */
  def nearDuplicatePairs(
      spark: SparkSession,
      corpus: DataFrame,
      minCosine: Double = 0.95,
      nBits: Int = 12,
      seed: Long = 13L,
      maxBucket: Int = 1024
  ): DataFrame = {
    import spark.implicits._
    val dim = corpus.select("embedding").as[Array[Float]].head().length
    val planesB = spark.sparkContext.broadcast(hyperplanes(nBits, dim, seed))

    val sigUdf = udf((emb: Array[Float]) => {
      val s = signatureOf(emb, planesB.value)
      (s :: (0 until nBits).map(b => s ^ (1 << b)).toList).map(_.toLong)
    })

    val pairGen = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      for {
        i <- members.indices
        j <- (i + 1) until members.length
        a = members(i); b = members(j)
        c = cosine(
          a.getSeq[Float](1).toArray,
          b.getSeq[Float](1).toArray)
        if c >= minCosine
      } yield (a.getLong(0), b.getLong(0), c)
    }

    corpus
      .select(col("vec_id"), col("embedding"), explode(sigUdf(col("embedding"))).as("sig"))
      .groupBy("sig")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("members"))
      .filter(size(col("members")) > 1)
      .withColumn("members", slice(col("members"), 1, maxBucket))
      .select(explode(pairGen(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"),
        round(col("p._3"), 6).as("cosine"))
      .distinct()
  }
}
