package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64
import graft.sim.{Ann, Ivf}

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * k-means-cluster the embedding space, then within each cluster drop all
  * but one member of every ε-cosine duplicate group. Documents that an
  * n-gram/MinHash pass calls distinct but an embedding model maps to
  * near-identical points (paraphrases, template re-fills, translations of
  * boilerplate) land in the same cluster and get cut here.
  *
  * Spark shape (the paper's own recipe, distributed):
  *   1. TRAIN on a bounded hash-selected sample — [[Ivf.train]]'s
  *      deterministic driver-side Lloyd (the corpus never reaches the
  *      driver; centroids are k·dim floats, broadcastable at any corpus
  *      size).
  *   2. ASSIGN each vector to its nearest centroid in one narrow map
  *      (broadcast centroids), carrying cosine-to-centroid for the keeper
  *      rule.
  *   3. One SHUFFLE of (vec_id, embedding, centroid_cos) keyed by
  *      (cluster, sub-cell) — the only time embeddings cross the wire, and
  *      the exchange the paper's all-pairs step fundamentally requires.
  *      Clusters larger than `maxPairwise` are split into deterministic
  *      hash sub-cells (cell count from a k-row count aggregate, so the
  *      split is planned, not discovered): pairwise work per task stays
  *      ≤ maxPairwise², at the documented cost that cross-cell duplicates
  *      in oversized clusters are missed — the same loud recall tradeoff
  *      as MinHashLSH's hot-bucket cap. At 100 TB one sizes k so clusters
  *      average well under the cap (the paper uses ~50k clusters for 233M
  *      docs) and the splitter is the guard rail, not the common path.
  *   4. Per cell: exact pairwise cosine ≥ ε → union-find components →
  *      per-group keeper. All order-independent (float comparisons are
  *      exact), so shuffle nondeterminism cannot change the result.
  *
  * Keeper rule (paper §3: keep LOW centroid-similarity examples — they
  * carry the diversity): per duplicate group the member with the lowest
  * cosine-to-centroid survives, vec_id ascending as the tiebreak.
  *
  * Output: (vec_id, list_id, group_id, keep, centroid_cos) — one row per
  * input vector, embedding projected away before anything downstream.
  * group_id = min vec_id of the duplicate component (singletons: self).
  *
  * Reference analog: none — CorpusAid dedups byte-identical documents only
  * (`src/CorpusAid.py:2305-2313`); this is a training-data-pipeline
  * extension per the brief, oracled against an independent Python
  * replication (tools/gen_semdedup_golden.py).
  */
object SemDedup {

  /** @param corpus      columns vec_id:long, embedding:array<float>
    *                    (null embeddings are excluded — a vector that
    *                    cannot be placed cannot be deduped)
    * @param k           number of k-means clusters (size ∝ corpus/k)
    * @param eps         cosine threshold for "semantic duplicate"
    * @param maxPairwise per-task pairwise bound; clusters above it split
    *                    into hash sub-cells (logged — recall tradeoff)
    */
  def dedup(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 32,
      eps: Double = 0.98,
      maxPairwise: Int = 4096,
      sampleSize: Int = 4096,
      iterations: Int = 5,
      seed: Long = 17L
  ): DataFrame = {
    import spark.implicits._
    val index = Ivf.train(spark, corpus, k, sampleSize, iterations, seed)
    val idxB = spark.sparkContext.broadcast(index)

    val assigned = corpus
      .select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val l = idxB.value.nearest(v, 1)(0)
        (id, v, l, Ann.cosine(v, idxB.value.centroids(l)))
      }
      .toDF("vec_id", "embedding", "list_id", "centroid_cos")

    // Plan the cell split from cluster sizes: a k-row aggregate (bounded by
    // construction — k is a config, not data) collected and broadcast.
    val sizes = assigned.groupBy("list_id").count()
      .as[(Int, Long)].collect().toMap
    val cells: Map[Int, Int] = sizes.map { case (l, n) =>
      l -> math.max(1, math.ceil(n.toDouble / maxPairwise).toInt)
    }
    val split = sizes.filter { case (l, _) => cells(l) > 1 }
    if (split.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semdedup: ${split.size} cluster(s) over maxPairwise=$maxPairwise " +
          s"split into hash sub-cells (largest: ${split.values.max} members) " +
          "— cross-cell duplicates in those clusters are not detected; " +
          "raise k or maxPairwise for exhaustive within-cluster recall")
    val cellsB = spark.sparkContext.broadcast(cells)

    assigned
      .as[(Long, Array[Float], Int, Double)]
      .groupByKey { case (id, _, l, _) =>
        val n = cellsB.value.getOrElse(l, 1)
        (l, if (n == 1) 0 else java.lang.Math.floorMod(mix64(seed ^ id), n.toLong).toInt)
      }
      .flatMapGroups { (key: (Int, Int), members: Iterator[(Long, Array[Float], Int, Double)]) =>
        val listId = key._1
        // buffer ≤ maxPairwise members (the split above guarantees the
        // EXPECTED size; hash imbalance can exceed it slightly — that is a
        // memory bound of ~2× cap worst-practical, not a correctness issue);
        // sort by vec_id so iteration order is deterministic hygiene even
        // though every rule below is order-independent
        val m = members.map { case (id, v, _, cc) => (id, v, cc) }
          .toArray.sortBy(_._1)
        val n = m.length
        // union-find over ε-cosine pairs
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            if (find(i) != find(j) && Ann.cosine(m(i)._2, m(j)._2) >= eps)
              parent(find(j)) = find(i)
            j += 1
          }
          i += 1
        }
        // per component: group_id = min vec_id; keeper = min (centroid_cos, vec_id)
        val groups = (0 until n).groupBy(find)
        groups.iterator.flatMap { case (_, idxs) =>
          val gid = idxs.map(ix => m(ix)._1).min
          val keeper = idxs.minBy(ix => (m(ix)._3, m(ix)._1))
          idxs.iterator.map { ix =>
            (m(ix)._1, listId, gid, ix == keeper, m(ix)._3)
          }
        }
      }
      .toDF("vec_id", "list_id", "group_id", "keep", "centroid_cos")
      .withColumn("centroid_cos", round(col("centroid_cos"), 6))
  }

  /** keep==true rows joined back — the deduplicated corpus view. The join
    * is on vec_id only (the heavy payload columns never enter the dedup
    * shuffle above). */
  def kept(spark: SparkSession, corpus: DataFrame, decisions: DataFrame): DataFrame =
    corpus.join(decisions.filter(col("keep")).select("vec_id"), Seq("vec_id"), "left_semi")
}
