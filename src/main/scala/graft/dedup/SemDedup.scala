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
  *      Clusters larger than `maxPairwise` are SUB-CELLED BY VALUE (r6,
  *      r5-verdict task #3): per-cluster quantile thresholds over the
  *      members' centroid_cos, computed from a deterministic bounded
  *      sample (the sampleSize lowest id-hashes — Ivf.train's rule; 16
  *      bytes/row, one extra job), cut the cluster into ~equal cells;
  *      membership is #thresholds strictly below the member's cos, so
  *      equal cosines always co-locate (byte-identical duplicates
  *      provably) and an ε-pair splits only when a threshold lands inside
  *      its tiny cos gap — stress recall on planted near-copies went
  *      ~52% (the old hash sub-cells) → ~77% (a depth-2 Lloyd prototype;
  *      k-means boundaries cross dense mass) → the quantile cut (see
  *      OPTIMIZATION_r06.md). At most [[MaxReclusteredClusters]] clusters
  *      get thresholds; beyond that the old deterministic hash sub-cells
  *      remain as the loud fallback. Honest cost note: a value-mass spike
  *      (a mega-group of near-identical vectors) concentrates in one cell
  *      and pairs exhaustively — the union-find's find-equality shortcut
  *      makes that O(cell) cosines for an identical group, but per-task
  *      buffer memory is O(cell), not O(maxPairwise), in that
  *      pathological case. At 100 TB one sizes k so clusters average well
  *      under the cap (the paper uses ~50k clusters for 233M docs) and
  *      the splitter is the guard rail, not the common path.
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

  /** Cap on how many over-cap clusters get value thresholds (one bounded
    * sample job; 16-byte rows, ≤ sampleSize per cluster); clusters beyond
    * it fall back to hash sub-cells with a loud warn — a deployment with
    * MORE over-cap clusters has mis-sized k (the paper sizes k so clusters
    * average well under the pairwise cap). */
  val MaxReclusteredClusters: Int = 256

  /** @param corpus      columns vec_id:long, embedding:array<float>
    *                    (null embeddings are excluded — a vector that
    *                    cannot be placed cannot be deduped)
    * @param k           number of k-means clusters (size ∝ corpus/k)
    * @param eps         cosine threshold for "semantic duplicate"
    * @param maxPairwise per-task pairwise bound; clusters above it are
    *                    depth-2 re-clustered (hash sub-cells beyond
    *                    `maxReclustered` — logged recall tradeoff there)
    */
  def dedup(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 32,
      eps: Double = 0.98,
      maxPairwise: Int = 4096,
      sampleSize: Int = 4096,
      iterations: Int = 5,
      seed: Long = 17L,
      maxReclustered: Int = MaxReclusteredClusters
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

    // r6 (r5-verdict task #3): over-cap clusters are sub-celled by VALUE
    // instead of count-planned hash sub-cells (a hash split scatters each
    // duplicate group ~uniformly over the cells — measured ~52% recall on
    // the stress's planted near-copies). Only the MaxReclusteredClusters
    // largest clusters get thresholds — any excess beyond that cap (a
    // mis-sized k) falls back to the hash split, loudly.
    val overCapAll = split.keys.toSeq.sortBy(l => (-sizes(l), l))
    val (reclustered, hashSplit) = overCapAll.splitAt(maxReclustered)
    if (hashSplit.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semdedup: ${overCapAll.size} over-cap clusters exceed " +
          s"maxReclustered=$maxReclustered; ${hashSplit.size} " +
          "fall back to hash sub-cells (recall loss there) — raise k")
    if (split.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semdedup: ${split.size} cluster(s) over maxPairwise=$maxPairwise " +
          s"(largest: ${split.values.max} members) cut into centroid-cos " +
          "quantile sub-cells — a value-mass spike denser than maxPairwise " +
          "still pairs exhaustively (cost, not recall)")
    // Sub-cell key for re-clustered clusters: per-cluster QUANTILE
    // THRESHOLDS over centroid_cos (already computed per member). The cut
    // is BY VALUE — cell = #thresholds strictly below the member's cos —
    // so equal cosines always co-locate (byte-identical duplicates
    // provably so) and an ε-duplicate pair splits only when a threshold
    // falls inside its (tiny) cos gap. Thresholds come from the same
    // deterministic bounded sample rule as Ivf.train (the sampleSize
    // lowest id-hashes per cluster), and the sample rows are 16 bytes
    // each — embeddings never reach the driver. (A depth-2 Lloyd was
    // measured at 77% stress recall: in unstructured clusters the k-means
    // boundary passes through dense mass and splits tight pairs; the 1D
    // value cut leaves ~99% of planted near-copies together.)
    val subThresholds: Map[Int, Array[Double]] =
      if (reclustered.isEmpty) Map.empty
      else {
        val wantedB = spark.sparkContext.broadcast(reclustered.toSet)
        val ss = sampleSize
        val samples = assigned
          .select(col("list_id"), col("vec_id"), col("centroid_cos"))
          .as[(Int, Long, Double)]
          .filter(r => wantedB.value.contains(r._1))
          .groupByKey(_._1)
          .flatMapGroups { (l: Int, it: Iterator[(Int, Long, Double)]) =>
            // bounded per-cluster reservoir: the ss smallest id-hashes
            val heap = new java.util.PriorityQueue[(Long, Double)](
              ss + 1,
              (a: (Long, Double), b: (Long, Double)) =>
                java.lang.Long.compare(b._1, a._1)) // max-heap on hash
            it.foreach { case (_, id, cc) =>
              val h = mix64(seed ^ id)
              if (heap.size < ss) heap.add((h, cc))
              else if (h < heap.peek()._1) { heap.poll(); heap.add((h, cc)) }
            }
            import scala.jdk.CollectionConverters._
            heap.iterator().asScala.toArray.iterator
              .map { case (_, cc) => (l, cc) }
          }
          .collect()
        samples.groupBy(_._1).map { case (l, rows) =>
          val cs = rows.map(_._2).sorted
          val k2 = cells(l)
          l -> (1 until k2).map(i => cs((i.toLong * cs.length / k2).toInt))
            .distinct.toArray
        }
      }
    val subB = spark.sparkContext.broadcast(subThresholds)
    val cellsB = spark.sparkContext.broadcast(cells)

    assigned
      .as[(Long, Array[Float], Int, Double)]
      .groupByKey { case (id, _, l, cc) =>
        subB.value.get(l) match {
          case Some(ts) =>
            var cell = 0
            while (cell < ts.length && ts(cell) < cc) cell += 1
            (l, cell)
          case None =>
            val n = cellsB.value.getOrElse(l, 1)
            (l, if (n == 1) 0
            else java.lang.Math.floorMod(mix64(seed ^ id), n.toLong).toInt)
        }
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
