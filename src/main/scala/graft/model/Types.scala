package graft.model

import java.sql.Timestamp

/** Input record: one conversation turn.
  *
  * Mirrors the `input_hint` schema in BASELINE.json:
  * (conv_id string, turn_idx int32, role string, text string, tool string, ts timestamp).
  * The reference's unit of work is one text file = one Document
  * (reference: src/CorpusAid.py:447-454); here the unit is one turn, keyed by
  * (conv_id, turn_idx) instead of a normalized file path
  * (dedup key semantics: src/CorpusAid.py:725-733).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Output record: the processed-result triple of the reference
  * (file_path, original_text, processed_text) at src/CorpusAid.py:2469-2471,
  * widened with the quality-filter verdict mandated by the north rule.
  */
final case class CleanedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    clean_text: String,
    scrubbed_text: String,
    lang: String,
    lang_score: Double,
    ppl: Double,
    keep: Boolean,
    drop_reasons: Seq[String]
)

/** The pipeline configuration — the reference's flat parameter dict of 17 bools +
  * chars_to_remove + regex_pattern (src/CorpusAid.py:570-590), as an immutable,
  * eagerly-validated case class. Field order follows the reference dict.
  *
  * Validation semantics follow src/CorpusAid.py:596-619: a non-empty
  * `regexPattern` must compile; unlike the reference (which degrades invalid
  * user regexes to identity at src/CorpusAid.py:214-221,355) we fail at
  * plan-build time — the per-row contract stays never-throw.
  */
final case class CleanConfig(
    removeBreakLines: Boolean = false,
    lowercase: Boolean = false,
    charsToRemove: Seq[String] = Nil,
    wordTokenization: Boolean = false,
    removeStopWords: Boolean = false,
    regexPattern: String = "",
    stripHtml: Boolean = false,
    removeDiacritics: Boolean = false,
    removeGreek: Boolean = false,
    removeCyrillic: Boolean = false,
    removeSuperSubScript: Boolean = false,
    removeRomanPageNumbers: Boolean = false,
    removePageIndicators: Boolean = false,
    removePageNumbers: Boolean = false,
    removePageDelimiters: Boolean = false,
    removeBibliographicalReferences: Boolean = false,
    normalizeSpacing: Boolean = false,
    normalizeUnicode: Boolean = false,
    normalizeLineBreaks: Boolean = false
) {

  /** Reference short-circuit: pipeline is identity when every parameter is
    * falsy (src/CorpusAid.py:689-691). */
  def isIdentity: Boolean =
    !(removeBreakLines || lowercase || charsToRemove.nonEmpty || wordTokenization ||
      removeStopWords || regexPattern.nonEmpty || stripHtml || removeDiacritics ||
      removeGreek || removeCyrillic || removeSuperSubScript || removeRomanPageNumbers ||
      removePageIndicators || removePageNumbers || removePageDelimiters ||
      removeBibliographicalReferences || normalizeSpacing || normalizeUnicode ||
      normalizeLineBreaks)

  /** Eager plan-time validation (≙ reference src/CorpusAid.py:596-619). */
  def validated: CleanConfig = {
    if (regexPattern.nonEmpty) {
      // throws PatternSyntaxException on invalid pattern — fail before job submit
      java.util.regex.Pattern.compile(regexPattern, java.util.regex.Pattern.DOTALL)
    }
    require(charsToRemove != null, "chars_to_remove must be a list of strings")
    this
  }
}

object CleanConfig {

  /** All cleaning stages on — used by golden end-to-end fixtures. */
  val allOn: CleanConfig = CleanConfig(
    removeBreakLines = true,
    lowercase = true,
    charsToRemove = Nil,
    wordTokenization = true,
    removeStopWords = true,
    regexPattern = "",
    stripHtml = true,
    removeDiacritics = true,
    removeGreek = true,
    removeCyrillic = true,
    removeSuperSubScript = true,
    removeRomanPageNumbers = true,
    removePageIndicators = true,
    removePageNumbers = true,
    removePageDelimiters = true,
    removeBibliographicalReferences = true,
    normalizeSpacing = true,
    normalizeUnicode = true,
    normalizeLineBreaks = true
  )

  /** The default transcript-cleaning profile used by the flagship pipeline:
    * conservative normalization that preserves semantic content (no stop-word
    * removal / lowercasing, which would destroy turn text for training). */
  val transcriptDefault: CleanConfig = CleanConfig(
    normalizeUnicode = true,
    normalizeSpacing = true,
    removePageNumbers = false
  )
}
