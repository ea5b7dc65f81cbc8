package graft.quality

import java.util.Locale

/** Character-trigram language model with interpolated Kneser-Ney smoothing
  * (north_star: "Kneser-Ney-smoothed n-gram perplexity scorer, broadcast
  * ARPA-style hash tables").
  *
  * The model is trained deterministically from the embedded English seed
  * corpus and stored ARPA-style: a log-prob table per order plus a backoff
  * table per context, keyed by chars packed into a Long. Scoring walks
  * trigram → bigram → unigram with backoff weights, exactly like an ARPA
  * n-gram file consumer. The whole model is a few hundred KB and is
  * broadcast once per job by the pipeline.
  */
object Perplexity {

  private val D = 0.75 // absolute discount

  final case class Model(
      logp3: java.util.HashMap[java.lang.Long, java.lang.Float],
      logp2: java.util.HashMap[java.lang.Long, java.lang.Float],
      logp1: java.util.HashMap[java.lang.Long, java.lang.Float],
      backoff2: java.util.HashMap[java.lang.Long, java.lang.Float], // context ab
      backoff1: java.util.HashMap[java.lang.Long, java.lang.Float], // context b
      logpUnk: Float
  ) extends Serializable {

    @inline private def get(
        m: java.util.HashMap[java.lang.Long, java.lang.Float],
        k: Long
    ): java.lang.Float = m.get(k)

    /** log P(c | a b) with ARPA-style backoff. */
    def logProb(a: Char, b: Char, c: Char): Double = {
      val k3 = pack3(a, b, c)
      val p3 = get(logp3, k3)
      if (p3 != null) return p3.toDouble
      val bo2 = get(backoff2, pack2(a, b))
      val boW2 = if (bo2 != null) bo2.toDouble else 0.0
      val p2 = get(logp2, pack2(b, c))
      if (p2 != null) return boW2 + p2.toDouble
      val bo1 = get(backoff1, pack1(b))
      val boW1 = if (bo1 != null) bo1.toDouble else 0.0
      val p1 = get(logp1, pack1(c))
      if (p1 != null) return boW2 + boW1 + p1.toDouble
      boW2 + boW1 + logpUnk
    }

    /** Perplexity per character over the normalized text; `maxValue` caps
      * pathological inputs so downstream aggregation stays finite. */
    def perplexity(text: String, maxValue: Double = 1e6): Double = {
      val t = normalize(text)
      if (t.length < 3) return 1.0 // too short to score — neutral
      var sum = 0.0
      var n = 0
      var i = 2
      while (i < t.length) {
        sum += logProb(t.charAt(i - 2), t.charAt(i - 1), t.charAt(i))
        n += 1
        i += 1
      }
      math.min(maxValue, math.exp(-sum / n))
    }
  }

  @inline private def pack3(a: Char, b: Char, c: Char): Long =
    (a.toLong << 32) | (b.toLong << 16) | c.toLong
  @inline private def pack2(a: Char, b: Char): Long =
    0x1000000000000L | (a.toLong << 16) | b.toLong
  @inline private def pack1(a: Char): Long = 0x2000000000000L | a.toLong

  /** Normalization shared by training and scoring: lowercase, letters and
    * apostrophes kept, digits → '0', everything else → ' ', whitespace
    * collapsed, sentence boundary markers added. */
  def normalize(s: String): String = {
    val lower = s.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length + 2)
    sb.append('^')
    var prevSpace = true
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      val mapped: Char =
        if (Character.isLetter(c)) c
        else if (Character.isDigit(c)) '0'
        else if (c == '\'' || c == '’') '\''
        else ' '
      if (mapped == ' ') {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else { sb.append(mapped); prevSpace = false }
      i += 1
    }
    sb.append('$')
    sb.toString
  }

  /** Interpolated Kneser-Ney training on character trigrams.
    *
    * The DOUBLED default seed is deliberate count inflation: with the tiny
    * embedded corpus, doubling every trigram count halves the relative
    * Kneser-Ney discount (max(2c-D,0)/2N vs max(c-D,0)/N), softening the
    * penalty on rare-but-real trigrams. The resulting scores are pinned by
    * the committed golden labels — changing this requires regenerating
    * them (tools/gen_golden.py + GoldenLabels). */
  def train(corpus: String = SeedCorpora.english + SeedCorpora.english): Model = {
    import scala.collection.mutable
    val text = normalize(corpus)

    val c3 = mutable.LongMap.empty[Int].withDefaultValue(0)
    val c2 = mutable.LongMap.empty[Int].withDefaultValue(0)
    val c1 = mutable.LongMap.empty[Int].withDefaultValue(0)
    // continuation sets
    val follow2 = mutable.LongMap.empty[mutable.Set[Char]] // ab -> {c}
    val precede2 = mutable.LongMap.empty[mutable.Set[Char]] // bc <- {a} (types)
    val follow1 = mutable.LongMap.empty[mutable.Set[Char]] // b -> {c}
    val precede1 = mutable.LongMap.empty[mutable.Set[Char]] // c <- {b}

    var i = 2
    while (i < text.length) {
      val a = text.charAt(i - 2); val b = text.charAt(i - 1); val c = text.charAt(i)
      c3(pack3(a, b, c)) += 1
      c2(pack2(b, c)) += 1
      c1(pack1(c)) += 1
      follow2.getOrElseUpdate(pack2(a, b), mutable.Set.empty) += c
      precede2.getOrElseUpdate(pack2(b, c), mutable.Set.empty) += a
      follow1.getOrElseUpdate(pack1(b), mutable.Set.empty) += c
      precede1.getOrElseUpdate(pack1(c), mutable.Set.empty) += b
      i += 1
    }
    // context totals
    val ctx2 = mutable.LongMap.empty[Int].withDefaultValue(0) // count(ab·)
    c3.foreach { case (k, v) => ctx2(pack2(((k >> 32) & 0xffff).toChar, ((k >> 16) & 0xffff).toChar)) += v }
    val ctx1 = mutable.LongMap.empty[Int].withDefaultValue(0) // count(b·)
    c2.foreach { case (k, v) => ctx1(pack1(((k >> 16) & 0xffff).toChar)) += v }
    val bigramTypes = c2.size.toDouble

    val logp3 = new java.util.HashMap[java.lang.Long, java.lang.Float]()
    val logp2 = new java.util.HashMap[java.lang.Long, java.lang.Float]()
    val logp1 = new java.util.HashMap[java.lang.Long, java.lang.Float]()
    val backoff2 = new java.util.HashMap[java.lang.Long, java.lang.Float]()
    val backoff1 = new java.util.HashMap[java.lang.Long, java.lang.Float]()

    // unigram continuation probs: P_cont(c) = |{b : c2(bc)>0}| / |bigram types|
    c1.keys.foreach { k =>
      val c = (k & 0xffff).toChar
      val p = precede1.get(pack1(c)).map(_.size).getOrElse(0) / bigramTypes
      logp1.put(k, math.log(math.max(p, 1e-10)).toFloat)
    }
    // bigram KN: P(c|b) = max(N1+(·bc)-D,0)/N1+(·b·) + D*|follow(b)|/N1+(·b·) * P_cont(c)
    // (using continuation counts for the middle order, standard interpolated KN)
    val contCtx1 = mutable.LongMap.empty[Int].withDefaultValue(0) // Σ_c N1+(·bc) per b
    c2.keys.foreach { k =>
      val b = ((k >> 16) & 0xffff).toChar
      contCtx1(pack1(b)) += precede2.get(k).map(_.size).getOrElse(0)
    }
    c2.keys.foreach { k =>
      val b = ((k >> 16) & 0xffff).toChar; val c = (k & 0xffff).toChar
      val cont = precede2.get(k).map(_.size).getOrElse(0).toDouble
      val denom = math.max(1, contCtx1(pack1(b))).toDouble
      val lambda = D * follow1.get(pack1(b)).map(_.size).getOrElse(0) / denom
      val pc = math.exp(logp1.get(pack1(c)).toDouble)
      val p = math.max(cont - D, 0.0) / denom + lambda * pc
      logp2.put(k, math.log(math.max(p, 1e-10)).toFloat)
    }
    follow1.foreach { case (k, set) =>
      val denom = math.max(1, contCtx1(k)).toDouble
      backoff1.put(k, math.log(math.max(D * set.size / denom, 1e-10)).toFloat)
    }
    // trigram: P(c|ab) = max(c3-D,0)/c2(ab·) + D*|follow(ab)|/c2(ab·) * P(c|b)
    c3.foreach { case (k, v) =>
      val a = ((k >> 32) & 0xffff).toChar; val b = ((k >> 16) & 0xffff).toChar
      val c = (k & 0xffff).toChar
      val denom = ctx2(pack2(a, b)).toDouble
      val lambda = D * follow2.get(pack2(a, b)).map(_.size).getOrElse(0) / denom
      val pbc = math.exp(logp2.get(pack2(b, c)).toDouble)
      val p = math.max(v - D, 0.0) / denom + lambda * pbc
      logp3.put(java.lang.Long.valueOf(k), math.log(math.max(p, 1e-10)).toFloat)
    }
    follow2.foreach { case (k, set) =>
      val denom = math.max(1, ctx2(k)).toDouble
      backoff2.put(k, math.log(math.max(D * set.size / denom, 1e-10)).toFloat)
    }

    val logpUnk = math.log(1.0 / (c1.size + 1) * 0.01).toFloat
    Model(logp3, logp2, logp1, backoff2, backoff1, logpUnk)
  }

  /** JVM-wide singleton; pipeline broadcasts one instance per job. */
  lazy val model: Model = train()
}
