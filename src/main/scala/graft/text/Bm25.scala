package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 batch retrieval (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework: BM25 and Beyond"; idf in the Lucene
  * `ln(1 + (N − df + 0.5)/(df + 0.5))` form): score a bounded batch of
  * queries against the whole corpus and keep the top-k documents per
  * query. The pipeline use is benchmark-similarity retrieval — "which
  * corpus documents does this eval item retrieve" — the soft-match
  * complement of [[SpanDecontaminate]]'s verbatim span audit. (Reference
  * analog: none — CorpusAid has no retrieval; SURVEY §2 extension.)
  *
  * Architecture — broadcast the QUERY WORKLOAD, not an inverted index:
  * the query batch is benchmark-bounded (budget-guarded collect, loud
  * over budget), so document frequencies for query terms only, idf
  * weights, and per-query term lists all broadcast; scoring is then one
  * narrow pass over the corpus emitting a row per (query, matching doc),
  * and the only exchanges are the query-vocab-sized df aggregation and
  * [[graft.operators.GroupedTopK]]'s bounded top-k machinery. No inverted
  * index is materialized and no document text ever shuffles — the right
  * trade at 100 TB for a bounded query batch.
  *
  * Exactness design — the [[KnScorer]] micro-unit technique: each
  * (term, doc) BM25 contribution is one fixed-op-order IEEE chain
  *
  *   ratio = dl / avgdl;  norm = k1 · (1 − b + b·ratio)
  *   c     = idf(t) · ((tf · (k1+1)) / (tf + norm))
  *
  * quantized ONCE to `floor(c · 1e6 + 0.5)` micro-units; a (query, doc)
  * score is the plain Long SUM over matched terms — associative, so the
  * distributed sum is partitioning-exact and the independent Python
  * oracle (tools/gen_bm25_golden.py) replicates scores exactly. The only
  * transcendental is one `Math.log` per query term (the micro-nat 1-ulp
  * argument). `avgdl` is a single IEEE division of two corpus-exact
  * integers, bit-identical on both sides.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** `termQueries` is the workload-side inverted index (term → indices
    * into `queries`): scoring touches only the queries sharing at least
    * one matched term with the document, so the per-doc cost scales with
    * the MATCHED workload, not the whole batch — the difference between
    * O(docs × queries) and O(docs × candidates) at a 100k-query batch. */
  final case class Model(
      idf: java.util.HashMap[String, java.lang.Double],
      queries: Array[(Long, Array[String])],
      termQueries: java.util.HashMap[String, Array[Int]],
      avgdl: Double
  ) extends Serializable

  /** Distinct mode-A terms of a query, in first-occurrence order. */
  def queryTerms(text: String): Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    KnTrainer.pyTokens(text).foreach(seen.add)
    seen.toArray(new Array[String](0))
  }

  /** Corpus stats + per-term document frequencies (query terms only) →
    * broadcastable model. Two narrow corpus passes: one row-count/length
    * aggregate, one df aggregate whose exchange is query-vocab-bounded.
    *
    * @param maxQueries   loud-failure cap on the query batch size
    * @param maxTermBytes loud-failure cap on total query term bytes
    */
  def buildModel(
      spark: SparkSession,
      docs: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String = "doc_id",
      maxQueries: Long = 10000L,
      maxTermBytes: Long = 16L * 1024 * 1024
  ): Model = {
    import spark.implicits._
    val qStats = queries
      .agg(count(lit(1)), coalesce(sum(length(col(textCol))), lit(0L)))
      .head()
    require(
      qStats.getLong(0) <= maxQueries && qStats.getLong(1) <= maxTermBytes,
      s"bm25: query batch has ${qStats.getLong(0)} queries / " +
        s"${qStats.getLong(1)} text bytes, over the broadcast budget " +
        s"($maxQueries queries / $maxTermBytes bytes). The workload must " +
        "remain broadcastable — split the batch; there is no silent cap.")

    val qRows = queries
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .collect()
      .map { case (id, t) => (id, queryTerms(if (t == null) "" else t)) }
      .sortBy(_._1)
    val vocab = qRows.iterator.flatMap(_._2).toSet
    val bcVocab = spark.sparkContext.broadcast(vocab)

    val stats = docs
      .select(col(textCol)).as[String]
      .map(t => KnTrainer.pyTokens(t).length.toLong)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("value")), lit(0L)).as("tok"))
      .head()
    val n = stats.getLong(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = stats.getLong(1).toDouble / n.toDouble

    val dfRows = docs
      .select(col(textCol)).as[String]
      .flatMap { t =>
        val v = bcVocab.value
        val seen = scala.collection.mutable.HashSet.empty[String]
        KnTrainer.pyTokens(t).foreach(w => if (v.contains(w)) seen.add(w))
        seen
      }
      .toDF("term")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    val idf = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { t =>
      val d = dfRows.getOrElse(t, 0L).toDouble
      idf.put(t, math.log(1.0 + (n.toDouble - d + 0.5) / (d + 0.5)))
    }
    val termQueries = new java.util.HashMap[String, Array[Int]]()
    val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    qRows.zipWithIndex.foreach { case ((_, terms), qi) =>
      terms.foreach { t =>
        tmp.computeIfAbsent(t,
          _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += qi
      }
    }
    tmp.forEach((t, qs) => termQueries.put(t, qs.toArray))
    Model(idf, qRows, termQueries, avgdl)
  }

  /** One narrow corpus pass: a row per (query, doc with ≥ 1 matched
    * term) — (query_id, doc_id, n_matched, score_micro). */
  def scoreAll(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      model: Model,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val m = bc.value
        val ws = KnTrainer.pyTokens(text)
        val dl = ws.length.toDouble
        val tf = new java.util.HashMap[String, Integer]()
        ws.foreach { w =>
          if (m.idf.containsKey(w)) tf.merge(w, 1, (a, b) => a + b)
        }
        if (tf.isEmpty) Iterator.empty
        else {
          val ratio = dl / m.avgdl
          val norm = K1 * (1.0 - B + B * ratio)
          // candidates = queries sharing >= 1 matched term (the inverted
          // workload index) — identical output to scanning all queries,
          // since a query with zero matches emits nothing anyway
          val cand = new Array[Boolean](m.queries.length)
          tf.keySet().forEach { t =>
            val qs = m.termQueries.get(t)
            if (qs != null) {
              var i = 0
              while (i < qs.length) { cand(qs(i)) = true; i += 1 }
            }
          }
          (0 until m.queries.length).iterator.filter(cand).map { qi =>
            val (qid, terms) = m.queries(qi)
            var s = 0L
            var matched = 0L
            terms.foreach { t =>
              val f = tf.get(t)
              if (f != null) {
                matched += 1
                val tfd = f.doubleValue
                val c = m.idf.get(t).doubleValue *
                  ((tfd * (K1 + 1.0)) / (tfd + norm))
                s += math.floor(c * 1e6 + 0.5).toLong
              }
            }
            (qid, id, matched, s)
          }
        }
      }
      .toDF("query_id", idCol, "n_matched", "score_micro")
  }

  /** Full retrieval: top-`k` docs per query by (score desc, doc_id),
    * 1-based rank in `rk`. */
  def search(
      spark: SparkSession,
      docs: DataFrame,
      queries: DataFrame,
      textCol: String,
      k: Int,
      idCol: String = "doc_id"
  ): DataFrame = {
    val model = buildModel(spark, docs, queries, textCol, idCol)
    graft.operators.GroupedTopK.topK(
      scoreAll(spark, docs, textCol, model, idCol),
      "query_id", "score_micro", idCol, k)
  }
}
