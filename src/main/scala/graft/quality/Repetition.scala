package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.KnTrainer

/** Gopher repetition signals (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446,
  * Table A1): per-document duplicate-line and repeated-n-gram statistics,
  * the repetition half of the MassiveText quality filter. (Reference
  * analog: CorpusAid's heuristic rules have a cross-turn repetition check
  * but no within-document n-gram repetition battery —
  * `src/CorpusAid.py:446-520`; [[Heuristics.topTrigramCoverage]] is the
  * single-signal precursor of this full battery.)
  *
  * Exactness design — ALL-INTEGER contract: every signal is emitted as an
  * integer numerator (character or line counts); the Gopher thresholds are
  * applied by integer cross-multiplication (`numer * 100 > pct * denom`),
  * so there is NO floating point anywhere — the independent Python oracle
  * (tools/gen_repetition_golden.py) replicates the contract with plain
  * ints and the distributed computation is trivially partitioning-exact.
  *
  * Contract (mode-A tokens — [[KnTrainer.pyTokens]]; lines = `\n` split):
  *   - `n_chars`  = length of the single-space token join
  *     (Σ len(token) + max(0, L−1)) — the denominator for n-gram signals;
  *   - lines: `n_lines`, `n_dup_lines` = Σ count over line values with
  *     count ≥ 2 (every member of a duplicate group counts),
  *     `dup_line_chars` = Σ len(line) over those occurrences, against
  *     denominator `line_chars` = Σ len(line);
  *   - `top{2,3,4}_chars` = count(g) · len(g) for the most frequent
  *     n-gram g (space-joined; ties broken by the UTF-8-smallest joined
  *     string) WHEN g occurs at least twice, else 0 — a repetition
  *     signal, so a long-but-unique n-gram in a short document never
  *     trips the threshold;
  *   - `dup{5..10}_chars` = characters of the token join covered by at
  *     least one occurrence of an n-gram appearing ≥ 2 times — positions
  *     are marked per token, covered chars count each covered token's
  *     length plus the joining space between two covered neighbours.
  *
  * Thresholds (Gopher Table A1): keep requires duplicate-line fraction
  * ≤ 30%, duplicate-line character fraction ≤ 20%, top-{2,3,4}-gram
  * character fraction ≤ {20,18,16}%, duplicate-{5..10}-gram character
  * fraction ≤ {15,14,13,12,11,10}%.
  *
  * 100-TB shape: one narrow ZERO-SHUFFLE map pass — every signal is
  * per-document; nothing aggregates across documents and no text ever
  * shuffles. The signals column set is fixed-width integers, so the
  * output exchange (if any downstream) is cheap.
  */
object Repetition {

  /** (threshold numerators, in percent) — Gopher Table A1. */
  val DupLinePct = 30
  val DupLineCharPct = 20
  val TopNgramPct: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)
  val DupNgramPct: Map[Int, Int] =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /** UTF-8 byte order, unsigned — code-point order, matching CPython's
    * `str <` (Java's UTF-16 compareTo ranks supplementary characters
    * before U+E000..U+FFFF — the GroupedTopK pitfall). */
  private def utf8Less(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    ab.length < bb.length
  }

  final case class Signals(
      nChars: Long,
      lineChars: Long,
      nLines: Long,
      nDupLines: Long,
      dupLineChars: Long,
      topChars: Array[Long], // n = 2, 3, 4
      dupChars: Array[Long] // n = 5 .. 10
  )

  /** The per-document signal battery (pure function — the unit the spec
    * pins and the Python oracle replicates). */
  def signals(text: String): Signals = {
    val t = if (text == null) "" else text
    // -- line signals ---------------------------------------------------
    val lines = t.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Integer]()
    lines.foreach(l => lineCounts.merge(l, 1, (a, b) => a + b))
    var nDup = 0L
    var dupChars = 0L
    lines.foreach { l =>
      if (lineCounts.get(l) >= 2) { nDup += 1; dupChars += l.length }
    }
    val lineChars = lines.map(_.length.toLong).sum

    // -- n-gram signals over mode-A tokens ------------------------------
    // grams are substrings of the precomputed single-space join (one char
    // copy per window — no per-window array slice + re-join), counted
    // once per n and reused by the coverage pass
    val ws = KnTrainer.pyTokens(t)
    val L = ws.length
    val joined = ws.mkString(" ")
    val nChars = joined.length.toLong
    // token start offsets within the join
    val starts = new Array[Int](L)
    var off = 0
    var i = 0
    while (i < L) { starts(i) = off; off += ws(i).length + 1; i += 1 }
    @inline def gram(j: Int, n: Int): String =
      joined.substring(starts(j), starts(j + n - 1) + ws(j + n - 1).length)

    val top = new Array[Long](3)
    var n = 2
    while (n <= 4) {
      if (L >= n) {
        val counts = new java.util.HashMap[String, Integer]()
        var best: String = null
        var bestC = 0
        var j = 0
        while (j + n <= L) {
          val g = gram(j, n)
          val c: Int = counts.merge(g, 1, (a, b) => a + b)
          if (c > bestC || (c == bestC && (best == null || utf8Less(g, best)))) {
            best = g; bestC = c
          }
          j += 1
        }
        top(n - 2) = if (bestC >= 2) bestC.toLong * best.length else 0L
      }
      n += 1
    }

    val dup = new Array[Long](6)
    n = 5
    while (n <= 10) {
      if (L >= n) {
        val w = L - n + 1
        val grams = new Array[String](w)
        val counts = new java.util.HashMap[String, Integer]()
        var j = 0
        while (j < w) {
          grams(j) = gram(j, n)
          counts.merge(grams(j), 1, (a, b) => a + b)
          j += 1
        }
        val covered = new Array[Boolean](L)
        j = 0
        while (j < w) {
          if (counts.get(grams(j)) >= 2) {
            var k = j
            while (k < j + n) { covered(k) = true; k += 1 }
          }
          j += 1
        }
        var chars = 0L
        var k = 0
        while (k < L) {
          if (covered(k)) {
            chars += ws(k).length
            if (k > 0 && covered(k - 1)) chars += 1 // the joining space
          }
          k += 1
        }
        dup(n - 5) = chars
      }
      n += 1
    }
    Signals(nChars, lineChars, lines.length.toLong, nDup, dupChars, top, dup)
  }

  /** keep = every signal at or under its Gopher threshold (integer
    * cross-multiplication — no division). */
  def keep(s: Signals): Boolean =
    s.nDupLines * 100 <= DupLinePct.toLong * s.nLines &&
      s.dupLineChars * 100 <= DupLineCharPct.toLong * math.max(1L, s.lineChars) &&
      (2 to 4).forall(n =>
        s.topChars(n - 2) * 100 <= TopNgramPct(n).toLong * math.max(1L, s.nChars)) &&
      (5 to 10).forall(n =>
        s.dupChars(n - 5) * 100 <= DupNgramPct(n).toLong * math.max(1L, s.nChars))

  /** One narrow zero-shuffle pass: the full integer signal battery plus
    * the keep verdict per document. */
  def apply(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val s = signals(text)
        (id, s.nChars, s.lineChars, s.nLines, s.nDupLines, s.dupLineChars,
          s.topChars(0), s.topChars(1), s.topChars(2),
          s.dupChars(0), s.dupChars(1), s.dupChars(2),
          s.dupChars(3), s.dupChars(4), s.dupChars(5),
          keep(s))
      }
      .toDF(idCol, "n_chars", "line_chars", "n_lines", "n_dup_lines",
        "dup_line_chars", "top2_chars", "top3_chars", "top4_chars",
        "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
        "dup9_chars", "dup10_chars", "keep")
  }
}
