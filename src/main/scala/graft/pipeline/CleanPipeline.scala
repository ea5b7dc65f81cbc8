package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.kernel.TextKernels
import graft.model.CleanConfig

/** Compiles a validated [[CleanConfig]] into the reference's fixed-order
  * cleaning plan (stage order is semantics-bearing — reference
  * src/CorpusAid.py:625-684, SURVEY.md §2.1 T22).
  *
  * Two equivalent executions of the same plan:
  *
  *  - [[kernelChain]] — a single fused `String => String` closure: ONE
  *    UTF8String→String conversion per row regardless of how many stages are
  *    enabled, all regex `Pattern`s compiled once at plan build (the
  *    reference's regex-precompilation property, src/CorpusAid.py:212 etc.).
  *    This is the production path, exposed as the codegen-friendly native
  *    expression [[graft.functions.CleanText]].
  *
  *  - [[columnChain]] — built-in Catalyst expressions (`regexp_replace`,
  *    `lower`, `translate`) for every stage whose semantics they can express
  *    byte-exactly, with contiguous runs of kernel-only stages fused into one
  *    UDF each. Used for cross-validation tests and DuckDB-oracle queries.
  *
  * Equality of the two paths is asserted by property tests
  * (CleanPipelineSpec).
  */
object CleanPipeline {

  /** One compiled stage: the kernel function plus, when built-ins can express
    * it exactly, the Column transformation. */
  final case class Stage(
      name: String,
      kernel: String => String,
      column: Option[Column => Column]
  )

  /** Java-regex inline flags matching Python 3 re defaults:
    * (?u) UNICODE_CASE, (?U) UNICODE_CHARACTER_CLASS. */
  private val U = "(?U)"

  private def rr(pat: String, rep: String = ""): Column => Column =
    c => regexp_replace(c, lit(pat), lit(rep))

  /** Build the ordered stage list for a config. Mirrors update_pipeline
    * (src/CorpusAid.py:625-684): a disabled stage never enters the plan
    * (operator elision). Adjacent char-class filters (greek/cyrillic/
    * super-sub, stages 16-18) are fused into one single-pass kernel stage. */
  def stages(cfg0: CleanConfig): Seq[Stage] = {
    val cfg = cfg0.validated
    val b = Seq.newBuilder[Stage]

    // 1. Normalization
    if (cfg.normalizeUnicode)
      b += Stage("normalize_unicode", TextKernels.normalizeUnicode, None)
    if (cfg.removeDiacritics)
      b += Stage("remove_diacritics", TextKernels.removeDiacritics, None)
    if (cfg.normalizeSpacing)
      b += Stage(
        "normalize_spacing",
        TextKernels.normalizeSpacing,
        Some { c =>
          var t = c
          t = regexp_replace(t, lit(U + "\\s+([.,?!;:])"), lit("$1"))
          t = regexp_replace(t, lit(U + "([.,?!;:])(\\S)"), lit("$1 $2"))
          t = regexp_replace(t, lit(U + "\\(\\s+"), lit("("))
          t = regexp_replace(t, lit(U + "\\s+\\)"), lit(")"))
          t = regexp_replace(t, lit(U + "\\[\\s+"), lit("["))
          t = regexp_replace(t, lit(U + "\\s+\\]"), lit("]"))
          t = regexp_replace(t, lit(U + "\\{\\s+"), lit("{"))
          t = regexp_replace(t, lit(U + "\\s+\\}"), lit("}"))
          t = regexp_replace(t, lit(U + "\\s{2,}"), lit(" "))
          regexp_replace(t, lit(U + "^\\s+|\\s+$"), lit(""))
        }
      )
    if (cfg.normalizeLineBreaks)
      b += Stage("normalize_line_breaks", TextKernels.normalizeLineBreaks, None)
    if (cfg.removeBreakLines)
      b += Stage(
        "remove_break_lines",
        TextKernels.removeBreakLines,
        Some(c => translate(c, "\n", " "))
      )

    // 2. Removal
    if (cfg.charsToRemove.nonEmpty) {
      val pat = TextKernels.characterFilterPattern(cfg.charsToRemove).get
      b += Stage(
        "chars_to_remove",
        TextKernels.characterFilter(pat, _),
        Some(rr("(?iu)" + U + pat.pattern))
      )
    }
    if (cfg.removePageNumbers)
      b += Stage(
        "remove_page_numbers",
        TextKernels.removePageNumbers,
        Some(rr(U + "(?md)^\\s*\\d{1,4}\\s*$"))
      )
    if (cfg.removeRomanPageNumbers)
      b += Stage(
        "remove_roman_page_numbers",
        TextKernels.removeRomanPageNumbers,
        Some(rr(U + "(?md)^\\s*[IiVvXxLlCcDdMm]{1,7}\\s*$"))
      )
    if (cfg.removePageIndicators)
      b += Stage(
        "remove_page_indicators",
        TextKernels.removePageIndicators,
        Some(rr(U + "(?<![\\p{L}\\p{N}_])(?:[Pp]age|[Pp]ag\\.?)\\s+(?:\\d+|[IVXLCDM]+)(?![\\p{L}\\p{N}_])"))
      )
    if (cfg.removePageDelimiters)
      b += Stage(
        "remove_page_delimiters",
        TextKernels.removePageDelimiters,
        Some(rr(U + "---\\s*Page\\s+\\d+\\s*---"))
      )
    if (cfg.removeBibliographicalReferences)
      b += Stage(
        "remove_bibliographical_references",
        TextKernels.removeBibliographicalReferences,
        Some(rr(U + "\\([A-Z][a-z]+(?:[^()]*?\\d{4}[^()]*?)?\\)"))
      )

    // 3. Transformation
    // lowercase is kernel-only: Spark's builtin lower() inherits Java's
    // final-sigma context evaluation, which diverges from CPython's on edge
    // contexts like "²Σ-" (see TextKernels.lowercase / the fuzz battery)
    if (cfg.lowercase)
      b += Stage("lowercase", TextKernels.lowercase, None)
    if (cfg.stripHtml)
      b += Stage("strip_html", TextKernels.stripHtml, None)

    // 4. Tokenization & filtering
    if (cfg.wordTokenization)
      b += Stage("word_tokenization", TextKernels.wordTokenization, None)
    if (cfg.removeStopWords)
      b += Stage("remove_stop_words", TextKernels.removeStopWords, None)

    // 5. Character-set removal — fused single pass (SURVEY.md §7.5)
    if (cfg.removeGreek || cfg.removeCyrillic || cfg.removeSuperSubScript) {
      val (g, cy, ss) = (cfg.removeGreek, cfg.removeCyrillic, cfg.removeSuperSubScript)
      b += Stage(
        "char_class_filter",
        TextKernels.charClassFilter(_, g, cy, ss),
        None
      )
    }

    // 6. User regex substitution
    if (cfg.regexPattern.nonEmpty) {
      val pat = TextKernels.compileUserPattern(cfg.regexPattern)
      b += Stage(
        "regex_substitution",
        TextKernels.regexSubstitute(pat, _),
        Some(rr("(?s)" + U + cfg.regexPattern))
      )
    }

    b.result()
  }

  /** The fused production kernel: left-fold of all enabled stages plus the
    * reference's final strip (pipeline.process strip at src/CorpusAid.py:444
    * + process_file strip at :694 — idempotent, one pyStrip suffices).
    * Identity config returns the input untouched, INCLUDING surrounding
    * whitespace (short-circuit at src/CorpusAid.py:690-691). Null-safe:
    * null maps to null (enforced by the expression/UDF wrapper, not here).
    */
  def kernelChain(cfg: CleanConfig): String => String = {
    if (cfg.isIdentity) identity
    else {
      val ss = stages(cfg)
      val kernels = ss.map(_.kernel).toArray
      (text: String) => {
        var t = text
        var i = 0
        while (i < kernels.length) { t = kernels(i)(t); i += 1 }
        TextKernels.pyStrip(t)
      }
    }
  }

  /** The built-in-first Column plan: built-in Catalyst expressions where
    * exact, contiguous kernel-only runs fused into one UDF each. */
  def columnChain(cfg: CleanConfig): Column => Column = {
    if (cfg.isIdentity) identity
    else {
      val ss = stages(cfg)
      // group contiguous stages by expressibility
      val groups = ss.foldLeft(List.empty[(Boolean, List[Stage])]) {
        case (acc, st) =>
          val expressible = st.column.isDefined
          acc match {
            case (e, run) :: rest if e == expressible => (e, st :: run) :: rest
            case _ => (expressible, st :: Nil) :: acc
          }
      }.map { case (e, run) => (e, run.reverse) }.reverse

      val stripUdf = udf((s: String) =>
        if (s == null) null else TextKernels.pyStrip(s))

      (input: Column) => {
        val afterStages = groups.foldLeft(input) { case (c, (expressible, run)) =>
          if (expressible) run.foldLeft(c)((cc, st) => st.column.get(cc))
          else {
            val kernels = run.map(_.kernel).toArray
            val fused = udf { (s: String) =>
              if (s == null) null
              else {
                var t = s
                var i = 0
                while (i < kernels.length) { t = kernels(i)(t); i += 1 }
                t
              }
            }
            fused(c)
          }
        }
        stripUdf(afterStages)
      }
    }
  }
}
