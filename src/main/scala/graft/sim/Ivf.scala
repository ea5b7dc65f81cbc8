package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * companion to the hyperplane LSH in [[Ann]].
  *
  * Index build: k-means coarse centroids trained DETERMINISTICALLY on a
  * hash-selected sample (driver-side Lloyd iterations — the sample is
  * bounded, the corpus is not), then one distributed pass assigns every
  * vector to its nearest centroid (broadcast centroids). The assignment is
  * the partition key: at production scale the lists are written bucketed by
  * centroid so queries touch only nProbe lists.
  *
  * Query: probe the nProbe nearest centroids' lists with the same bounded
  * per-partition heaps as the exact path.
  */
object Ivf {

  final case class Index(centroids: Array[Array[Float]]) extends Serializable {
    def nearest(v: Array[Float], n: Int): Array[Int] =
      centroids.indices
        .map(i => (i, Ann.cosine(v, centroids(i))))
        .sortBy { case (i, s) => (-s, i) }
        .take(n).map(_._1).toArray
  }

  /** Deterministic sample: vectors whose id-hash falls lowest; driver-side
    * Lloyd with cosine assignment. */
  def train(
      spark: SparkSession,
      corpus: DataFrame, // vec_id, embedding
      k: Int,
      sampleSize: Int = 4096,
      iterations: Int = 5,
      seed: Long = 17L
  ): Index = {
    import spark.implicits._
    val sample = corpus
      .select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull) // corrupt rows must not NPE Lloyd
      .as[(Long, Array[Float])]
      .map { case (id, v) => (mix64(seed ^ id), v) }
      .orderBy(col("_1"))
      .limit(sampleSize)
      .collect()
      .map(_._2)
    require(sample.nonEmpty, "empty corpus")
    Index(lloyd(sample, k, iterations))
  }

  /** Driver-side deterministic Lloyd kernel over an in-order sample —
    * extracted (r6) so [[graft.dedup.SemDedup]]'s depth-2 re-cluster of
    * over-cap clusters runs the EXACT same machinery on per-cluster
    * samples. Init: first k DISTINCT sample points in input order —
    * duplicated embeddings (common pre-dedup) in the first k slots would
    * create identical centroids, and the strict '>' assignment starves the
    * higher-indexed copy forever (a permanently dead list). */
  private[graft] def lloyd(
      sample: Array[Array[Float]],
      k: Int,
      iterations: Int): Array[Array[Float]] = {
    val dim = sample.head.length
    var centroids = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Float]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val itS = sample.iterator
      while (itS.hasNext && out.length < k) {
        val v = itS.next()
        if (seen.add(v.toSeq)) out += v.clone()
      }
      out.toArray
    }
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestS = Double.MinValue
        var c = 0
        while (c < centroids.length) {
          val s = Ann.cosine(v, centroids(c))
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val m = new Array[Float](dim)
          var d = 0
          while (d < dim) { m(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
          m
        }
      }.toArray
      it += 1
    }
    centroids
  }

  /** Assign each corpus vector to its coarse list. */
  def assign(spark: SparkSession, corpus: DataFrame, index: Index): DataFrame = {
    // null embeddings (corrupt upstream rows) get list -1: never probed,
    // never NPE the job
    val idxB = spark.sparkContext.broadcast(index)
    val listUdf = udf((v: Array[Float]) =>
      if (v == null) -1 else idxB.value.nearest(v, 1)(0))
    corpus.withColumn("list_id", listUdf(col("embedding")))
  }

  /** list_id → (query_id, query_vec, norm) for the queries probing it. */
  private def probeMap(
      index: Index,
      queries: Array[(Long, Array[Float])],
      nProbe: Int
  ): Map[Int, Array[(Long, Array[Float], Double)]] =
    queries
      .flatMap { case (qid, qv) =>
        index.nearest(qv, nProbe).map(l => l -> ((qid, qv, Ann.norm(qv))))
      }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }

  /** Bounded-heap scan of an assigned (vec_id, embedding, list_id) table
    * against a broadcast probe map — shared by the in-memory and the
    * on-disk-index query paths. */
  private def heapScan(
      spark: SparkSession,
      assigned: DataFrame,
      probes: Map[Int, Array[(Long, Array[Float], Double)]],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val probesB = spark.sparkContext.broadcast(probes)
    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    val partial = assigned
      .select(col("vec_id"), col("embedding"), col("list_id").cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { iter =>
        val pr = probesB.value
        val acc = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        iter.foreach { case (vid, emb, list) =>
          pr.get(list).foreach { qs =>
            val en = Ann.norm(emb)
            qs.foreach { case (qid, qv, qn) =>
              val denom = en * qn
              val score = if (denom == 0.0) 0.0 else Ann.dot(qv, emb) / denom
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

  /** Top-k search probing nProbe lists per query (in-memory assignment: the
    * whole corpus is still scanned; use the written index to prune I/O). */
  def topK(
      spark: SparkSession,
      corpus: DataFrame,
      index: Index,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nProbe: Int = 4
  ): DataFrame =
    heapScan(spark, assign(spark, corpus, index), probeMap(index, queries, nProbe), k)

  // -- persisted index: lists bucketed by list_id on disk -------------------

  /** Materialize the index: corpus assigned + written PARTITIONED BY list_id
    * (one directory per coarse list — the production layout the scaladoc
    * promises: a probe reads only its nProbe directories), centroids beside
    * it. Layout: `path/lists/list_id=NN/` (parquet), `path/centroids/`. */
  def writeIndex(
      spark: SparkSession,
      corpus: DataFrame,
      index: Index,
      path: String
  ): Unit = {
    import spark.implicits._
    assign(spark, corpus, index)
      // co-locate each list's vectors so a list is one contiguous file set
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/lists")
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  def readIndex(spark: SparkSession, path: String): Index = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    Index(rows.map(_._2))
  }

  /** The on-disk lists a query run would scan, already partition-pruned to
    * the probed list_ids (assert `PartitionFilters` in the scan plan). */
  def probedLists(
      spark: SparkSession,
      path: String,
      index: Index,
      queries: Array[(Long, Array[Float])],
      nProbe: Int
  ): DataFrame = {
    val lists = queries
      .flatMap { case (_, qv) => index.nearest(qv, nProbe) }
      .distinct.toSeq
    spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(lists: _*))
  }

  /** Top-k over a written index: the scan touches ONLY the nProbe probed
    * list directories per query set (partition pruning on list_id), instead
    * of the whole corpus — the 100-TB query path. */
  def topKIndexed(
      spark: SparkSession,
      path: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    val index = readIndex(spark, path)
    heapScan(spark, probedLists(spark, path, index, queries, nProbe),
      probeMap(index, queries, nProbe), k)
  }
}
