package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.KnTrainer

/** RedPajama-V2-style residual quality signals (Together AI 2023,
  * "RedPajama-Data-v2") — the per-document signal families NOT already
  * covered by the Gopher repetition battery ([[Repetition]], q78), the C4
  * line filters ([[LineFilters]], q81) or the heuristic rule set
  * ([[Heuristics]], q14/q15):
  *
  *   - `rps_doc_unigram_entropy`  → `ent_micro` (integer micro-nats),
  *   - `rps_doc_frac_unique_words` → `n_unique` / `n_words`,
  *   - `rps_doc_frac_all_caps_words` → `n_allcaps` / `n_words`,
  *   - `rps_doc_frac_no_alph_words` → `n_noalph` / `n_words`,
  *   - `rps_lines_ending_with_ellipsis` → `ellipsis_lines` / `n_lines`,
  *   - `rps_lines_start_with_bulletpoint` → `bullet_lines` / `n_lines`,
  *   - `rps_doc_ldnoobw_words` → `list_hits` (blocked-word occurrences;
  *     the word list is a caller-supplied parameter — the fixture list in
  *     q85 is a stand-in, swap in the real LDNOOBW list in production).
  *
  * ALL-INTEGER CONTRACT (the q78 pattern): every signal is an exact count;
  * fractions never materialize — the keep verdict is replayed downstream by
  * integer cross-multiplication. The one transcendental (entropy's ln) uses
  * the canonical micro-nat quantizer `floor(ln(x)·1e6 + 0.5)` over INTEGER
  * inputs only (word counts), where `Math.log` matches CPython `math.log`
  * bit-for-bit on this platform (the [[graft.text.Dsir]]/KN precedent), and
  * the per-document entropy is a pure integer expression of the quantized
  * logs:
  *
  *   ent_micro = µln(N) − (Σ_w c_w · µln(c_w)) / N   (Long floor division;
  *   all terms non-negative, so JVM truncation == Python floor division)
  *
  * which is the plug-in estimator H = ln N − (1/N)·Σ c ln c in micro-nats.
  *
  * Tokenization: mode-A whitespace runs ([[KnTrainer.pyTokens]] — CPython
  * `str.split()` parity; newlines are whitespace, so word signals see the
  * same tokens before and after line-wrapping). Lines: `split("\n", -1)`,
  * empties kept. Case tests are ASCII-only (locale-free — the Turkish-İ
  * rule: never `toUpperCase` semantics in a keep/drop path); `all_caps`
  * replicates CPython `str.isupper()` restricted to ASCII (≥1 letter, no
  * lowercase), `no_alph` is "no ASCII letter".
  *
  * Scale shape: one narrow zero-shuffle map per document — no exchange, no
  * driver state beyond the broadcast word list. The 100-TB path is the same
  * map.
  */
object RpSignals {

  /** First code points that count as a bullet (RedPajama-V2's
    * `rps_lines_start_with_bulletpoint` glyph family). */
  val BulletChars: Set[Char] = Set('•', '‣', '▶', '◦', '*', '-')

  final case class Signals(
      nWords: Long,
      nUnique: Long,
      entMicro: Long,
      nAllCaps: Long,
      nNoAlph: Long,
      nLines: Long,
      ellipsisLines: Long,
      bulletLines: Long,
      listHits: Long)

  /** `floor(ln(x)·1e6 + 0.5)` — the canonical micro-nat quantizer
    * (`graft.text.Dsir.micro` / the KN scorers use the same expression). */
  private def microLn(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** CPython `str.isupper()` over ASCII: at least one letter, none lowercase. */
  private def isAllCaps(w: String): Boolean = {
    var hasLetter = false
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c >= 'a' && c <= 'z') return false
      if (c >= 'A' && c <= 'Z') hasLetter = true
      i += 1
    }
    hasLetter
  }

  private def hasNoAsciiLetter(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      if (isAsciiLetter(w.charAt(i))) return false
      i += 1
    }
    true
  }

  private def asciiLower(w: String): String = {
    val b = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  def signals(text: String, blockList: Set[String]): Signals = {
    val t = if (text == null) "" else text

    // -- line signals ---------------------------------------------------
    val lines = t.split("\n", -1)
    var ell = 0L
    var bul = 0L
    lines.foreach { l =>
      if (l.endsWith("...") || l.endsWith("…")) ell += 1
      if (l.nonEmpty && BulletChars.contains(l.charAt(0))) bul += 1
    }

    // -- word signals (mode-A tokens; '\n' is whitespace) ----------------
    val ws = KnTrainer.pyTokens(t)
    val n = ws.length.toLong
    val counts = new java.util.HashMap[String, Long]()
    var allCaps = 0L
    var noAlph = 0L
    var hits = 0L
    ws.foreach { w =>
      counts.merge(w, 1L, (a, b) => a + b)
      if (isAllCaps(w)) allCaps += 1
      if (hasNoAsciiLetter(w)) noAlph += 1
      if (blockList.contains(asciiLower(w))) hits += 1
    }
    var sumCLnC = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); sumCLnC += c * microLn(c) }
    val ent = if (n == 0) 0L else microLn(n) - sumCLnC / n

    Signals(n, counts.size.toLong, ent, allCaps, noAlph,
      lines.length.toLong, ell, bul, hits)
  }

  /** Demonstration thresholds for the composite keep (RedPajama-V2 ships
    * signals, not verdicts; these cuts are this engine's documented rule,
    * integer cross-multiplied — no floats): entropy ≥ 2.0 nats, unique
    * words ≥ 10 %, all-caps ≤ 10 %, no-alph ≤ 20 %, ellipsis lines ≤ 30 %,
    * bullet lines ≤ 50 %, zero blocked-word hits. */
  def keep(s: Signals): Boolean =
    s.entMicro >= 2000000L &&
      s.nUnique * 100 >= 10 * math.max(1L, s.nWords) &&
      s.nAllCaps * 100 <= 10 * math.max(1L, s.nWords) &&
      s.nNoAlph * 100 <= 20 * math.max(1L, s.nWords) &&
      s.ellipsisLines * 100 <= 30 * math.max(1L, s.nLines) &&
      s.bulletLines * 100 <= 50 * math.max(1L, s.nLines) &&
      s.listHits == 0

  /** One narrow zero-shuffle pass: the integer signal battery plus the
    * keep verdict per document (the [[Repetition.apply]] shape). */
  def apply(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      blockList: Set[String],
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    val blockB = spark.sparkContext.broadcast(blockList)
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val s = signals(text, blockB.value)
        (id, s.nWords, s.nUnique, s.entMicro, s.nAllCaps, s.nNoAlph,
          s.nLines, s.ellipsisLines, s.bulletLines, s.listHits, keep(s))
      }
      .toDF(idCol, "n_words", "n_unique", "ent_micro", "n_allcaps",
        "n_noalph", "n_lines", "ellipsis_lines", "bullet_lines",
        "list_hits", "keep")
  }
}
