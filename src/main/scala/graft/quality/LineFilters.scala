package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.KnTrainer

/** C4-style line-level heuristic filters (Raffel et al. 2020 §2.2 — the
  * cleaning half; [[graft.text.LineDedup]] is the dedup half): per-line
  * keep rules plus whole-document drops, the "rule chain" a C4-shaped
  * pipeline applies before dedup. (Reference analog: CorpusAid's
  * line-oriented removals T2-T6 target OCR artifacts,
  * `src/CorpusAid.py:228-282`; these are the web-corpus counterparts.)
  *
  * Contract (lines = `\n` split; tokens = mode-A
  * [[KnTrainer.pyTokens]]; ALL string/integer operations — no floating
  * point, no locale: case folding is ASCII-only A-Z, so the independent
  * Python oracle replicates byte-exactly):
  *
  * Document-level drops (checked first, in order — `drop_reason`):
  *   - `lorem_ipsum`: the ASCII-lowercased text contains "lorem ipsum";
  *   - `brace`: the text contains "{" (code marker);
  *   - after line filtering, `too_few_lines`: fewer than `MinLines`
  *     surviving lines.
  * Line-level keeps (C4's sentence rules on the line unit):
  *   - ends in terminal punctuation (`. ! ? " '`);
  *   - has at least `MinWords` (3) mode-A tokens;
  *   - does not contain "javascript" (ASCII-lowercased).
  *
  * Output: (id, cleaned = surviving lines joined by `\n`, n_lines_in,
  * n_lines_kept, doc_keep, drop_reason) — `cleaned` is emitted even for
  * dropped documents (the caller decides whether to use it), and
  * `drop_reason` is null for kept documents.
  *
  * 100-TB shape: one narrow ZERO-SHUFFLE map pass; every rule is
  * per-document.
  */
object LineFilters {

  val MinWords = 3
  val MinLines = 3
  val Terminal: Set[Char] = Set('.', '!', '?', '"', '\'')

  /** ASCII-only lowercase (A-Z → a-z; everything else untouched) — the
    * locale-free fold both engines replicate trivially. */
  def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  final case class Result(
      cleaned: String,
      nLinesIn: Int,
      nLinesKept: Int,
      docKeep: Boolean,
      dropReason: String // null when kept
  )

  /** The per-document rule chain (pure function — the oracle contract). */
  def filter(text: String): Result = {
    val t = if (text == null) "" else text
    val lower = asciiLower(t)
    val lines = t.split("\n", -1)
    val kept = lines.filter { l =>
      l.nonEmpty && Terminal.contains(l.charAt(l.length - 1)) &&
        KnTrainer.pyTokens(l).length >= MinWords &&
        !asciiLower(l).contains("javascript")
    }
    val cleaned = kept.mkString("\n")
    val reason =
      if (lower.contains("lorem ipsum")) "lorem_ipsum"
      else if (t.contains("{")) "brace"
      else if (kept.length < MinLines) "too_few_lines"
      else null
    Result(cleaned, lines.length, kept.length, reason == null, reason)
  }

  /** One narrow zero-shuffle pass. */
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
        val r = filter(text)
        (id, r.cleaned, r.nLinesIn.toLong, r.nLinesKept.toLong,
          r.docKeep, r.dropReason)
      }
      .toDF(idCol, "cleaned", "n_lines_in", "n_lines_kept",
        "doc_keep", "drop_reason")
  }
}
