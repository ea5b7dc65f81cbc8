package graft.quality

import java.util.Locale

/** fastText-style language identification: character n-grams (1..3) hashed
  * into a fixed bucket space, scored against a dense (buckets × languages)
  * log-probability matrix (north_star: "character-n-gram hashing with a
  * broadcast embedding matrix").
  *
  * The matrix is trained deterministically at first use from the embedded
  * [[SeedCorpora]] with multinomial naive-Bayes estimates (add-k smoothing
  * over the bucket space). It is a plain serializable value — the pipeline
  * broadcasts ONE instance per job (QualityFilter) instead of rebuilding or
  * re-shipping it per task, which is the pattern that matters at
  * 1000-executor scale.
  */
object LangId {

  val Buckets: Int = 1 << 15
  private val Mask = Buckets - 1

  final case class Model(
      langs: Array[String],
      // column-major: weights(b) is the log-prob row for bucket b
      weights: Array[Array[Float]]
  ) extends Serializable {

    def langIndex(l: String): Int = langs.indexOf(l)

    /** Returns (bestLang, margin) where margin is the per-ngram log-odds gap
      * between best and runner-up — a calibration-free confidence score. */
    def classify(text: String): (String, Double) = {
      val scores = new Array[Double](langs.length)
      val n = hashNgrams(text, (h: Int) => {
        val row = weights(h & Mask)
        var i = 0
        while (i < scores.length) { scores(i) += row(i); i += 1 }
      })
      if (n == 0) return ("und", 0.0)
      if (scores.length == 1) return (langs(0), scores(0) / n) // 1-lang model
      var best = 0
      var second = 1
      if (scores(1) > scores(0)) { best = 1; second = 0 }
      var i = 2
      while (i < scores.length) {
        if (scores(i) > scores(best)) { second = best; best = i }
        else if (scores(i) > scores(second)) second = i
        i += 1
      }
      (langs(best), (scores(best) - scores(second)) / n)
    }
  }

  /** FNV-1a over the n-gram's chars, n = 1..3, sliding. Calls `sink` per
    * hash; returns number of n-grams. */
  private def hashNgrams(text0: String, sink: Int => Unit): Int = {
    val text = normalize(text0)
    val len = text.length
    var count = 0
    var i = 0
    while (i < len) {
      var h = 0x811c9dc5
      var n = 0
      var j = i
      while (j < len && n < 3) {
        h = (h ^ text.charAt(j)) * 0x01000193
        sink(h)
        count += 1
        n += 1
        j += 1
      }
      i += 1
    }
    count
  }

  /** Lowercase, collapse whitespace runs to single space, drop digits (they
    * carry no language signal and skew short technical turns). */
  private def normalize(s: String): String = {
    val lower = s.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var prevSpace = true
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else if (!Character.isDigit(c)) {
        sb.append(c); prevSpace = false
      }
      i += 1
    }
    sb.toString
  }

  /** Deterministic training from the embedded seed corpora. */
  def train(corpora: Seq[(String, String)] = SeedCorpora.all): Model = {
    val langs = corpora.map(_._1).toArray
    val counts = Array.ofDim[Int](Buckets, langs.length)
    val totals = new Array[Long](langs.length)
    corpora.zipWithIndex.foreach { case ((_, text), li) =>
      hashNgrams(text, h => {
        counts(h & Mask)(li) += 1
        totals(li) += 1
      })
    }
    val k = 0.1 // add-k smoothing
    val weights = Array.ofDim[Float](Buckets, langs.length)
    var b = 0
    while (b < Buckets) {
      var i = 0
      while (i < langs.length) {
        weights(b)(i) =
          math.log((counts(b)(i) + k) / (totals(i) + k * Buckets)).toFloat
        i += 1
      }
      b += 1
    }
    Model(langs, weights)
  }

  /** JVM-wide singleton (deterministic — same bytes on every executor). The
    * production pipeline still broadcasts it once per job; this lazy val is
    * the fallback for direct kernel use and tests. */
  lazy val model: Model = train()
}
