package graft.functions

import java.util.regex.Pattern

import graft.kernel.TextKernels

/** Port of the reference's AdvancedPatternBuilder regex synthesis
  * (src/CorpusAid.py:1110-1157): each rule row compiles to
  * `escape(start).*?END` where END is `\d` (Single Number),
  * `\d{n}` (Multiple Numbers) or `escape(end)` (Specific Sequence);
  * rows join with `|`; whole-words wraps the whole alternation in
  * `\b(...)\b`; flags are DOTALL plus IGNORECASE unless case-sensitive.
  *
  * Faithful quirks kept: a row is included only when BOTH `start` and `end`
  * are non-empty after trimming (src/CorpusAid.py:1117) — even though the
  * `end` text is unused for the numeric end types; `numberLength` must be a
  * positive integer string for Multiple Numbers (:1138-1141).
  */
object PatternBuilder {

  sealed trait EndType
  case object SingleNumber extends EndType
  case object MultipleNumbers extends EndType
  case object SpecificSequence extends EndType

  final case class Rule(
      start: String,
      endType: EndType,
      end: String = "",
      numberLength: Int = 0
  )

  /** Synthesize the pattern string (no compilation). Mirrors updatePattern. */
  def synthesize(rules: Seq[Rule], wholeWords: Boolean): String = {
    val parts = rules
      .map(r => r.copy(start = r.start.trim, end = r.end.trim))
      .filter(r => r.start.nonEmpty && r.end.nonEmpty)
      .map { r =>
        val start = TextKernels.reEscape(r.start)
        val end = r.endType match {
          case SingleNumber => "\\d"
          case MultipleNumbers =>
            require(r.numberLength > 0,
              "Number Length must be a positive integer for Multiple Numbers.")
            s"\\d{${r.numberLength}}"
          case SpecificSequence => TextKernels.reEscape(r.end)
        }
        s"$start.*?$end"
      }
    val joined = parts.mkString("|")
    if (wholeWords) s"\\b($joined)\\b" else joined
  }

  /** Compile with the reference's flag logic (DOTALL ± IGNORECASE), plus the
    * Unicode flags needed for Python parity on the JVM. */
  def compile(rules: Seq[Rule], wholeWords: Boolean, caseSensitive: Boolean): Pattern = {
    val flags = Pattern.DOTALL | Pattern.UNICODE_CHARACTER_CLASS |
      (if (caseSensitive) 0 else Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
    val src = synthesize(rules, wholeWords)
    // every rule filtered out (the :1117 quirk) would leave "" or "\b()\b" —
    // a pattern matching the EMPTY STRING at every position; applying that
    // is never what a rule author meant, so fail loudly instead
    require(rules.exists(r => r.start.trim.nonEmpty && r.end.trim.nonEmpty),
      "no valid rules: every row was dropped by the non-empty start/end " +
        "requirement (reference quirk src/CorpusAid.py:1117)")
    Pattern.compile(src, flags)
  }

  /** The wizard's interactive test harness (testPattern,
    * src/CorpusAid.py:1167-1205): all match ranges in the sample. */
  def findMatches(p: Pattern, text: String): Seq[(Int, Int)] = {
    val m = p.matcher(text)
    val out = Seq.newBuilder[(Int, Int)]
    while (m.find()) out += ((m.start(), m.end()))
    out.result()
  }
}
