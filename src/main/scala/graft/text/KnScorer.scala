package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scores documents under a [[KnTrainer]]-trained interpolated Kneser-Ney
  * bigram LM — the second half of the CCNet pattern (Wenzek et al. 2020):
  * train the LM on a curated seed corpus (q68), score the crawl with it.
  * This is the corpus-trained counterpart of the driver-side char-trigram
  * scorer in [[graft.quality.Perplexity]] (reference analog: the quality
  * heuristics in `src/CorpusAid.py` have no LM; the north-star spec calls
  * for "broadcast ARPA-style hash tables", which is exactly this shape).
  *
  * Exactness design — integer micro-nats:
  * log-probabilities are quantized ONCE PER MODEL ENTRY to integer
  * micro-nats, `floor(ln(p) * 1e6 + 0.5)`, and a document's score is the
  * plain Long SUM of its bigrams' micro-nats. Integer addition is
  * associative, so the distributed aggregation is order- and
  * partitioning-independent — no floating-point drift across cluster
  * sizes, and the independent Python oracle replicates scores exactly.
  * (`Math.log` and CPython's `math.log` agree bit-for-bit on >99.9% of
  * count-ratio inputs on this platform and differ by at most 1 ulp on the
  * rest; a 1-ulp difference flips the micro-nat rounding only when
  * `ln(p)*1e6` sits within ~1e-10 of a half-integer — probability ~2e-13
  * per model entry.)
  *
  * ARPA-style tables, all keyed on aggregated model entries (never on
  * documents), broadcast once per job:
  *   - pair(w1)(w2)  = micro(ln p_KN(w2|w1)) for seen bigrams — p_KN is the
  *     UNROUNDED fixed-op-order count-ratio chain of [[KnTrainer]] (the
  *     pre-round doubles the q68 oracle proved bit-exact cross-language;
  *     the 6-dp-rounded column is NOT used because a rare bigram under a
  *     high-frequency context can round to 0.0 and ln(0) = -inf);
  *   - ctx(w1)       = micro(ln((D * N1+(w1 .)) / c(w1 .))) — the backoff
  *     weight of a seen context;
  *   - cont(w2)      = micro(ln(N1+(. w2) / N1+(. .))) — the continuation
  *     probability of a seen right word;
  *   - unkMicro      = micro(ln(1 / (N1+(. .) + 1))) — the floor for a
  *     never-seen continuation.
  * Scoring rule per adjacent token pair (a, b):
  *   seen pair            → pair(a)(b)
  *   unseen pair, a seen  → ctx(a) + (cont(b) | unkMicro)   [n_oov += 1]
  *   a unseen             →          (cont(b) | unkMicro)   [n_oov += 1]
  *
  * 100-TB shape: the model is bounded by the SEED corpus (CCNet trains on
  * Wikipedia-scale seeds), not by the crawl being scored, so a guarded
  * driver collect + broadcast is the correct architecture — scoring itself
  * is one narrow pass over the crawl with zero shuffles. The collect is
  * budget-guarded by entry count AND bytes and fails loudly over budget
  * (raise the budget or train on a smaller seed; there is no silent
  * truncation).
  */
object KnScorer {

  final case class Model(
      pair: java.util.HashMap[String, java.util.HashMap[String, java.lang.Integer]],
      ctx: java.util.HashMap[String, java.lang.Integer],
      cont: java.util.HashMap[String, java.lang.Integer],
      unkMicro: Int
  ) extends Serializable

  /** `floor(ln(p) * 1e6 + 0.5)` — the canonical quantizer; the Python
    * oracle applies `math.floor(math.log(p) * 1e6 + 0.5)` to the same
    * IEEE double. */
  private def micro(p: Double): Int =
    math.floor(math.log(p) * 1e6 + 0.5).toInt

  /** Builds the broadcastable model from [[KnTrainer.bigramModel]] output
    * (columns w1, w2, c12, c1, n1p_fwd, n1p_bwd, p_kn).
    *
    * Driver-footprint accounting behind the guard: the transient collect
    * materializes boxed Rows (~200 B/entry beyond the key chars) and the
    * built tables cost ~2·(keyChars·2 + 90) B/entry, so the defaults
    * (4M entries / 256 MB key bytes) keep the peak around ~1.5 GB — sized
    * for an 8 GB driver with headroom, and loud (never truncating) above.
    *
    * @param maxEntries loud-failure cap on bigram types collected
    * @param maxBytes   loud-failure cap on total key bytes collected
    */
  def buildModel(
      modelDf: DataFrame,
      discount: Double = 0.75,
      maxEntries: Long = 4000000L,
      maxBytes: Long = 256L * 1024 * 1024
  ): Model = {
    val stats = modelDf
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(length(col("w1")) + length(col("w2"))), lit(0L)).as("b"))
      .head()
    val (n, bytes) = (stats.getLong(0), stats.getLong(1))
    require(
      n <= maxEntries && bytes <= maxBytes,
      s"kn_scorer: model has $n bigram types / $bytes key bytes, over the " +
        s"driver-collect budget ($maxEntries entries / $maxBytes bytes). " +
        "Train on a smaller seed corpus or raise the budget — the model " +
        "must remain broadcastable; it is bounded by the seed, not the crawl.")

    val rows = modelDf
      .select("w1", "w2", "c12", "c1", "n1p_fwd", "n1p_bwd")
      .collect()
    val pair =
      new java.util.HashMap[String, java.util.HashMap[String, java.lang.Integer]]()
    val ctx = new java.util.HashMap[String, java.lang.Integer]()
    val cont = new java.util.HashMap[String, java.lang.Integer]()
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val w1 = r.getString(0)
      val w2 = r.getString(1)
      val c12 = r.getLong(2).toDouble
      val c1 = r.getLong(3).toDouble
      val fwd = r.getLong(4).toDouble
      val bwd = r.getLong(5).toDouble
      // the q68 fixed op order, unrounded:
      val p = (math.max(c12 - discount, 0.0) +
        (discount * fwd) * (bwd / n.toDouble)) / c1
      pair
        .computeIfAbsent(w1, _ => new java.util.HashMap[String, java.lang.Integer]())
        .put(w2, micro(p))
      if (!ctx.containsKey(w1))
        ctx.put(w1, micro((discount * fwd) / c1))
      if (!cont.containsKey(w2))
        cont.put(w2, micro(bwd / n.toDouble))
      i += 1
    }
    Model(pair, ctx, cont, micro(1.0 / (n.toDouble + 1.0)))
  }

  /** One narrow zero-shuffle pass over `docs`: (doc_id, n_bigrams, n_oov,
    * score_micro). Tokens are mode-A ([[KnTrainer.pyTokens]]); docs with
    * fewer than two tokens score (0, 0, 0). */
  def score(
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
      .map { case (id, text) =>
        val m = bc.value
        val ws = KnTrainer.pyTokens(text)
        var s = 0L
        var oov = 0L
        var i = 1
        while (i < ws.length) {
          val a = ws(i - 1)
          val b = ws(i)
          val inner = m.pair.get(a)
          val hit: java.lang.Integer = if (inner == null) null else inner.get(b)
          if (hit != null) s += hit.longValue
          else {
            oov += 1
            val contB = m.cont.get(b)
            val base = if (contB == null) m.unkMicro.toLong else contB.longValue
            val cw = m.ctx.get(a)
            s += (if (cw == null) base else cw.longValue + base)
          }
          i += 1
        }
        (id, math.max(0, ws.length - 1).toLong, oov, s)
      }
      .toDF(idCol, "n_bigrams", "n_oov", "score_micro")
  }

  /** Trigram ARPA tables, micro-nat quantized. Keys are space-joined
    * (tokens cannot contain whitespace — mode-A split — so the join is
    * collision-free). */
  final case class TriModel(
      tri: java.util.HashMap[String, java.lang.Integer],
      ctx3: java.util.HashMap[String, java.lang.Integer],
      pair2: java.util.HashMap[String, java.lang.Integer],
      ctx2: java.util.HashMap[String, java.lang.Integer],
      cont1: java.util.HashMap[String, java.lang.Integer],
      unkMicro: Int
  ) extends Serializable

  /** Builds the trigram scorer tables from [[KnTrainer.trigramModel]]
    * output (all 10 count columns). Canonical per-entry arithmetic (the
    * oracle contract — same fixed order as the q75 column expression,
    * then one ln + micro-quantize per entry):
    *   tri(abc)   = micro(P3)            ctx3(ab) = micro((D·n_ab)/c_ab)
    *   pair2(bc)  = micro(P2)            ctx2(b)  = micro((D·n_b_cont)/n_b_mid)
    *   cont1(c)   = micro(n_c/T)         unk      = micro(1/(T+1))
    */
  def buildTriModel(
      modelDf: DataFrame,
      discount: Double = 0.75,
      // see buildModel's driver-footprint note; trigram rows carry 10
      // columns and up to five table entries each, so the defaults are
      // tighter still
      maxEntries: Long = 3000000L,
      maxBytes: Long = 192L * 1024 * 1024
  ): TriModel = {
    val stats = modelDf
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(length(col("w1")) + length(col("w2")) + length(col("w3"))),
          lit(0L)).as("b"))
      .head()
    val (n, bytes) = (stats.getLong(0), stats.getLong(1))
    require(
      n <= maxEntries && bytes <= maxBytes,
      s"kn_scorer: trigram model has $n types / $bytes key bytes, over the " +
        s"driver-collect budget ($maxEntries entries / $maxBytes bytes). " +
        "Train on a smaller seed corpus or raise the budget — the model " +
        "must remain broadcastable; it is bounded by the seed, not the crawl.")

    val rows = modelDf.select("w1", "w2", "w3", "c3", "c_ab", "n_ab",
      "n_bc", "n_b_mid", "n_b_cont", "n_c").collect()
    val tri = new java.util.HashMap[String, java.lang.Integer]()
    val ctx3 = new java.util.HashMap[String, java.lang.Integer]()
    val pair2 = new java.util.HashMap[String, java.lang.Integer]()
    val ctx2 = new java.util.HashMap[String, java.lang.Integer]()
    val cont1 = new java.util.HashMap[String, java.lang.Integer]()
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val a = r.getString(0); val b = r.getString(1); val c = r.getString(2)
      val c3v = r.getLong(3).toDouble
      val cAb = r.getLong(4).toDouble
      val nAb = r.getLong(5).toDouble
      val nBc = r.getLong(6).toDouble
      val nBMid = r.getLong(7).toDouble
      val nBCont = r.getLong(8).toDouble
      val nC = r.getLong(9).toDouble
      val p1 = nC / n.toDouble
      val p2 = (math.max(nBc - discount, 0.0) +
        (discount * nBCont) * p1) / nBMid
      val p3 = (math.max(c3v - discount, 0.0) +
        (discount * nAb) * p2) / cAb
      tri.put(a + " " + b + " " + c, micro(p3))
      if (!ctx3.containsKey(a + " " + b))
        ctx3.put(a + " " + b, micro((discount * nAb) / cAb))
      if (!pair2.containsKey(b + " " + c))
        pair2.put(b + " " + c, micro(p2))
      if (!ctx2.containsKey(b))
        ctx2.put(b, micro((discount * nBCont) / nBMid))
      if (!cont1.containsKey(c))
        cont1.put(c, micro(p1))
      i += 1
    }
    TriModel(tri, ctx3, pair2, ctx2, cont1, micro(1.0 / (n.toDouble + 1.0)))
  }

  /** One narrow zero-shuffle pass: (idCol, n_trigrams, n_oov, score_micro).
    * Per trigram (a, b, c):
    *   seen             → tri(abc)
    *   (a,b) seen ctx   → ctx3(ab) + P2-part          [n_oov += 1]
    *   else             → P2-part                     [n_oov += 1]
    * where P2-part = pair2(bc) | ctx2(b) + (cont1(c) | unk) | (cont1(c) | unk).
    * Docs with fewer than three tokens score (0, 0, 0). */
  def scoreTri(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      model: TriModel,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val m = bc.value
        val ws = KnTrainer.pyTokens(text)
        var s = 0L
        var oov = 0L
        var i = 2
        while (i < ws.length) {
          val a = ws(i - 2); val b = ws(i - 1); val c = ws(i)
          val hit = m.tri.get(a + " " + b + " " + c)
          if (hit != null) s += hit.longValue
          else {
            oov += 1
            val p2hit = m.pair2.get(b + " " + c)
            val p2part: Long =
              if (p2hit != null) p2hit.longValue
              else {
                val c1 = m.cont1.get(c)
                val base = if (c1 == null) m.unkMicro.toLong else c1.longValue
                val cw2 = m.ctx2.get(b)
                if (cw2 == null) base else cw2.longValue + base
              }
            val cw3 = m.ctx3.get(a + " " + b)
            s += (if (cw3 == null) p2part else cw3.longValue + p2part)
          }
          i += 1
        }
        (id, math.max(0, ws.length - 2).toLong, oov, s)
      }
      .toDF(idCol, "n_trigrams", "n_oov", "score_micro")
  }

  /** The trigram distributed scoring tier — [[scoreJoin]] at order 3:
    * five model-table join sides (tri/ctx3/pair2/ctx2/cont1), the
    * [[scoreTri]] backoff chain replayed in column expressions, bit-equal
    * to the broadcast tier (spec + 50× stress assert). */
  def scoreTriJoin(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      modelDf: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val m = graft.run.Materialize.pin(
      modelDf.select("w1", "w2", "w3", "c3", "c_ab", "n_ab",
        "n_bc", "n_b_mid", "n_b_cont", "n_c"))
    val t = m.count()
    val tD = t.toDouble
    // the buildTriModel fixed op order, verbatim (one UDF per table —
    // all over the seed-bounded TYPE table, never the crawl)
    def p2Of(nBc: Long, nBMid: Long, nBCont: Long, nC: Long): Double =
      (math.max(nBc.toDouble - discount, 0.0) +
        (discount * nBCont.toDouble) * (nC.toDouble / tD)) / nBMid.toDouble
    val triMicro = udf((c3: Long, cAb: Long, nAb: Long, nBc: Long,
        nBMid: Long, nBCont: Long, nC: Long) =>
      micro((math.max(c3.toDouble - discount, 0.0) +
        (discount * nAb.toDouble) * p2Of(nBc, nBMid, nBCont, nC)) / cAb.toDouble))
    val ctx3Micro = udf((cAb: Long, nAb: Long) =>
      micro((discount * nAb.toDouble) / cAb.toDouble))
    val pair2Micro = udf((nBc: Long, nBMid: Long, nBCont: Long, nC: Long) =>
      micro(p2Of(nBc, nBMid, nBCont, nC)))
    val ctx2Micro = udf((nBMid: Long, nBCont: Long) =>
      micro((discount * nBCont.toDouble) / nBMid.toDouble))
    val cont1Micro = udf((nC: Long) => micro(nC.toDouble / tD))
    val unk = micro(1.0 / (tD + 1.0)).toLong

    val triT = m.select(col("w1"), col("w2"), col("w3"),
      triMicro(col("c3"), col("c_ab"), col("n_ab"), col("n_bc"),
        col("n_b_mid"), col("n_b_cont"), col("n_c")).as("tri_micro"))
    val ctx3T = m.select(col("w1"), col("w2"),
      ctx3Micro(col("c_ab"), col("n_ab")).as("ctx3_micro"))
      .dropDuplicates("w1", "w2")
    val pair2T = m.select(col("w2"), col("w3"),
      pair2Micro(col("n_bc"), col("n_b_mid"), col("n_b_cont"), col("n_c"))
        .as("pair2_micro"))
      .dropDuplicates("w2", "w3")
    val ctx2T = m.select(col("w2"),
      ctx2Micro(col("n_b_mid"), col("n_b_cont")).as("ctx2_micro"))
      .dropDuplicates("w2")
    val cont1T = m.select(col("w3"),
      cont1Micro(col("n_c")).as("cont1_micro"))
      .dropDuplicates("w3")

    val ids = docs.select(col(idCol).cast("long").as(idCol))
    val tri = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, txt) =>
        val ws = KnTrainer.pyTokens(txt)
        (2 until ws.length).iterator.map(i => (id, ws(i - 2), ws(i - 1), ws(i)))
      }
      .toDF(idCol, "w1", "w2", "w3")
    val scored = tri
      .join(triT, Seq("w1", "w2", "w3"), "left")
      .join(ctx3T, Seq("w1", "w2"), "left")
      .join(pair2T, Seq("w2", "w3"), "left")
      .join(ctx2T, Seq("w2"), "left")
      .join(cont1T, Seq("w3"), "left")
      .select(col(idCol),
        when(col("tri_micro").isNotNull, col("tri_micro").cast("long"))
          .otherwise(coalesce(col("ctx3_micro").cast("long"), lit(0L)) +
            coalesce(col("pair2_micro").cast("long"),
              coalesce(col("ctx2_micro").cast("long"), lit(0L)) +
                coalesce(col("cont1_micro").cast("long"), lit(unk))))
          .as("m"),
        when(col("tri_micro").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"), sum(col("oov")).as("n_oov"),
        sum(col("m")).as("score_micro"))
    ids
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_trigrams", "n_oov", "score_micro"))
      .select(idCol, "n_trigrams", "n_oov", "score_micro")
  }

  /** Train-on-`seed`, score-`docs` — the trigram CCNet composition, with
    * the same budget-based tier selection as [[trainAndScore]]. */
  def trainAndScoreTri(
      spark: SparkSession,
      seed: DataFrame,
      docs: DataFrame,
      textCol: String,
      discount: Double = 0.75,
      maxEntries: Long = 3000000L,
      maxBytes: Long = 192L * 1024 * 1024,
      idCol: String = "doc_id"
  ): DataFrame = {
    val modelDf = KnTrainer.trigramModel(spark, seed, textCol, discount)
    val stats = modelDf
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(length(col("w1")) + length(col("w2")) + length(col("w3"))),
          lit(0L)).as("b"))
      .head()
    if (stats.getLong(0) <= maxEntries && stats.getLong(1) <= maxBytes)
      scoreTri(spark, docs, textCol,
        buildTriModel(modelDf, discount, maxEntries, maxBytes), idCol)
    else
      scoreTriJoin(spark, docs, textCol, modelDf, discount, idCol)
  }

  /** DISTRIBUTED scoring tier — the over-budget path: when the seed model
    * exceeds the driver broadcast budget, score via joins against the
    * model TYPE table instead of collecting it. Same contract as
    * [[score]], value-exactly: the per-entry micro-nats are computed by
    * the SAME fixed-op-order arithmetic + quantizer (a UDF over the
    * model table — bounded by the seed, never the crawl), and per-pair
    * rule/oov semantics are replayed in column expressions, so the two
    * tiers are bit-equal (asserted in KnScorerSpec and the 50× stress
    * battery).
    *
    * 100-TB shape: one corpus-bigram-sized exchange into the pair join
    * (unavoidable once the model cannot broadcast) plus two w1/w2-keyed
    * joins whose right sides are model-type-bounded; the final
    * aggregation is doc-bounded with map-side partial aggregation. */
  def scoreJoin(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      modelDf: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val m = graft.run.Materialize.pin(
      // reused by three join sides + the scalar count: pin so the model
      // DAG (itself corpus-sized for the seed) runs exactly once
      modelDf.select("w1", "w2", "c12", "c1", "n1p_fwd", "n1p_bwd"))
    val n = m.count()
    val nD = n.toDouble
    val pairMicro = udf((c12: Long, c1: Long, fwd: Long, bwd: Long) =>
      // the buildModel fixed op order, verbatim
      micro((math.max(c12.toDouble - discount, 0.0) +
        (discount * fwd.toDouble) * (bwd.toDouble / nD)) / c1.toDouble))
    val ctxMicro = udf((c1: Long, fwd: Long) =>
      micro((discount * fwd.toDouble) / c1.toDouble))
    val contMicro = udf((bwd: Long) => micro(bwd.toDouble / nD))
    val unk = micro(1.0 / (nD + 1.0)).toLong

    val pairT = m.select(col("w1"), col("w2"),
      pairMicro(col("c12"), col("c1"), col("n1p_fwd"), col("n1p_bwd"))
        .as("pair_micro"))
    val ctxT = m.select(col("w1"),
      ctxMicro(col("c1"), col("n1p_fwd")).as("ctx_micro"))
      .dropDuplicates("w1")
    val contT = m.select(col("w2"),
      contMicro(col("n1p_bwd")).as("cont_micro"))
      .dropDuplicates("w2")

    val ids = docs.select(col(idCol).cast("long").as(idCol))
    val bi = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val ws = KnTrainer.pyTokens(t)
        (1 until ws.length).iterator.map(i => (id, ws(i - 1), ws(i)))
      }
      .toDF(idCol, "w1", "w2")
    val scored = bi
      .join(pairT, Seq("w1", "w2"), "left")
      .join(ctxT, Seq("w1"), "left")
      .join(contT, Seq("w2"), "left")
      .select(col(idCol),
        when(col("pair_micro").isNotNull, col("pair_micro").cast("long"))
          .otherwise(coalesce(col("ctx_micro").cast("long"), lit(0L)) +
            coalesce(col("cont_micro").cast("long"), lit(unk))).as("m"),
        when(col("pair_micro").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("oov")).as("n_oov"),
        sum(col("m")).as("score_micro"))
    ids
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "n_oov", "score_micro"))
      .select(idCol, "n_bigrams", "n_oov", "score_micro")
  }

  /** Train-on-`seed`, score-`docs` in one call (the CCNet composition).
    * Tier selection: the model broadcasts when within the driver budget
    * (the fast zero-shuffle path — CCNet-sized seeds); above it, scoring
    * degrades to the distributed join tier ([[scoreJoin]], value-exact)
    * instead of failing — the 100-TB posture for oversized seeds. */
  def trainAndScore(
      spark: SparkSession,
      seed: DataFrame,
      docs: DataFrame,
      textCol: String,
      discount: Double = 0.75,
      maxEntries: Long = 4000000L,
      maxBytes: Long = 256L * 1024 * 1024,
      idCol: String = "doc_id"
  ): DataFrame = {
    val modelDf = KnTrainer.bigramModel(spark, seed, textCol, discount)
    val stats = modelDf
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(length(col("w1")) + length(col("w2"))), lit(0L)).as("b"))
      .head()
    if (stats.getLong(0) <= maxEntries && stats.getLong(1) <= maxBytes)
      score(spark, docs, textCol,
        buildModel(modelDf, discount, maxEntries, maxBytes), idCol)
    else
      scoreJoin(spark, docs, textCol, modelDf, discount, idCol)
  }
}
