package graft.quality

import graft.kernel.TextKernels

/** Heuristic quality rules (north_star: "CorpusAid's heuristic rule set —
  * length ratios, symbol/word ratios, repetition detection"). All per-turn
  * rules are pure functions of the text; the cross-turn repetition rule is
  * evaluated by the pipeline with a Window (it needs neighbor rows).
  *
  * Thresholds live in [[FilterConfig]]; defaults are the engine spec that
  * golden labels are generated from.
  */
final case class FilterConfig(
    minChars: Int = 5,
    maxChars: Int = 20000,
    minWords: Int = 2,
    maxWordLen: Int = 50,
    minAlphaRatio: Double = 0.55,
    maxSymbolRatio: Double = 0.10,
    maxDigitRatio: Double = 0.50,
    repMinWords: Int = 10,
    maxTopTrigramCover: Double = 0.30,
    langMinChars: Int = 30,
    allowedLangs: Set[String] = Set("en"),
    pplMinChars: Int = 30,
    maxPpl: Double = 25.0,
    crossTurnWindow: Int = 3
) extends Serializable

object Heuristics {

  /** Per-turn statistics needed by the rules — computed in ONE pass over the
    * code points plus one tokenization. */
  final case class Stats(
      nChars: Int,
      nLetters: Int,
      nDigits: Int,
      nSymbols: Int,
      nSpaces: Int,
      nWords: Int,
      maxWordLen: Int,
      topTrigramCover: Double
  )

  private val plainPunct: Set[Int] =
    ".,;:!?'\"()-–—[]{}/%&+*=<>@#_’‘“”…".codePoints().toArray.toSet

  def stats(text: String): Stats = {
    var letters = 0; var digits = 0; var symbols = 0; var spaces = 0; var n = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      n += 1
      if (Character.isLetter(cp)) letters += 1
      else if (Character.isDigit(cp)) digits += 1
      else if (TextKernels.pyIsSpace(cp)) spaces += 1
      else if (!plainPunct.contains(cp)) symbols += 1
      i += Character.charCount(cp)
    }
    val words = splitWords(text)
    var maxLen = 0
    var w = 0
    while (w < words.length) {
      if (words(w).length > maxLen) maxLen = words(w).length
      w += 1
    }
    Stats(n, letters, digits, symbols, spaces, words.length, maxLen,
      topTrigramCoverage(words))
  }

  private def splitWords(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = -1
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val isSp = TextKernels.pyIsSpace(cp)
      if (isSp) {
        if (start >= 0) { out += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += Character.charCount(cp)
    }
    if (start >= 0) out += text.substring(start)
    out.toArray
  }

  /** Fraction of the turn covered by its most frequent word 3-gram:
    * maxCount * 3 / nWords. ~0 for normal prose, >1 possible for spam like
    * "buy now buy now …". */
  def topTrigramCoverage(words: Array[String]): Double = {
    if (words.length < 3) return 0.0
    val counts = new java.util.HashMap[String, Integer]()
    var max = 0
    var i = 2
    while (i < words.length) {
      val key = words(i - 2) + "\u0001" + words(i - 1) + "\u0001" + words(i)
      val c = counts.merge(key, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max * 3.0 / words.length
  }

  /** Evaluate all per-turn rules; returns the list of failed rule names
    * (empty = keep, pending the cross-turn and model rules). */
  def ruleFailures(
      text: String,
      role: String,
      lang: String,
      ppl: Double,
      cfg: FilterConfig
  ): List[String] = {
    val trimmed = TextKernels.pyStrip(text)
    val st = stats(trimmed)
    var fails = List.empty[String]
    // evaluated in reverse emission order so the list reads in spec order
    if (st.nChars >= cfg.pplMinChars && cfg.allowedLangs.contains(lang) &&
      ppl > cfg.maxPpl) fails ::= "high_perplexity"
    if (st.nChars >= cfg.langMinChars && !cfg.allowedLangs.contains(lang))
      fails ::= "lang_not_allowed"
    if (st.nWords >= cfg.repMinWords && st.topTrigramCover > cfg.maxTopTrigramCover)
      fails ::= "repetitive"
    if (st.maxWordLen > cfg.maxWordLen) fails ::= "long_token"
    val nonSpace = math.max(1, st.nChars - st.nSpaces)
    if (st.nDigits.toDouble / nonSpace > cfg.maxDigitRatio) fails ::= "digit_ratio"
    if (st.nSymbols.toDouble / nonSpace > cfg.maxSymbolRatio) fails ::= "symbol_ratio"
    if (st.nLetters.toDouble / nonSpace < cfg.minAlphaRatio) fails ::= "alpha_ratio"
    val minWords = if (role == "tool") 1 else cfg.minWords
    if (st.nWords < minWords) fails ::= "too_few_words"
    if (st.nChars > cfg.maxChars) fails ::= "too_long"
    if (st.nChars < cfg.minChars) fails ::= "too_short"
    fails
  }
}
