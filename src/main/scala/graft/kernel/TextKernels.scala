package graft.kernel

import java.text.Normalizer
import java.util.regex.Pattern
import java.util.Locale

/** Pure, deterministic `String => String` kernels for every text-transform
  * operator of the reference (T1–T19 in SURVEY.md §2.1). All patterns are
  * compiled once into static vals (the reference compiles each pattern in the
  * module constructor — src/CorpusAid.py:212,231,247,255,268,279,316,346 —
  * and we need the same property per-executor).
  *
  * Regex-dialect parity notes (SURVEY.md §7.4): Python 3 `\w \b \d \s` are
  * Unicode-aware by default; Java requires UNICODE_CHARACTER_CLASS for the
  * same behavior, and IGNORECASE needs UNICODE_CASE. Every pattern here sets
  * those flags explicitly.
  */
object TextKernels {

  private val UFLAGS = Pattern.UNICODE_CHARACTER_CLASS

  /** Python re's `\w` = str.isalnum() ∪ '_' — i.e. L* ∪ N* (INCLUDING No/Nl
    * numerics like ² ½ ₃, which Java's (?U)\w excludes) ∪ underscore. Used
    * wherever the reference pattern says \w or \b. */
  private val PYW = "[\\p{L}\\p{N}_]"

  /** Python `str.strip()` parity: Python strips code points where
    * `str.isspace()` — Unicode Zs/Zl/Zp plus the control whitespace
    * \t\n\v\f\r\x1c-\x1f\x85. Java's `String.strip` misses NBSP-family Zs
    * (isWhitespace=false there) and \x85. */
  @inline def pyIsSpace(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp) || cp == 0x85

  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && pyIsSpace(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
    while (j > i) {
      val cp = s.codePointBefore(j)
      if (!pyIsSpace(cp)) return s.substring(i, j)
      j -= Character.charCount(cp)
    }
    s.substring(i, j)
  }

  /** Python `str.splitlines()` parity: splits on \r\n and each of
    * \n \r \v \f \x1c \x1d \x1e \x85    , no trailing empty line. */
  def pySplitLines(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val isBreak = c == '\n' || c == '\r' || c == '\u000B' || c == '\f' ||
        c == '\u001C' || c == '\u001D' || c == '\u001E' || c == '\u0085' ||
        c == '\u2028' || c == '\u2029'
      if (isBreak) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += s.substring(start, n)
    out.toArray
  }

  /** Python `re.escape` parity (3.8+ behavior: escape non word-chars among
    * ASCII specials; leaves letters/digits/underscore and most others). We
    * escape everything that is not a Unicode word char, which is safe in both
    * dialects and keeps `\b` concatenation valid. */
  def reEscape(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.codePoints().forEach { cp =>
      val isWord = Character.isLetterOrDigit(cp) || cp == '_'
      if (!isWord) sb.append('\\')
      sb.appendCodePoint(cp)
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // T1 CharacterFilterModule (src/CorpusAid.py:197-225)
  // ---------------------------------------------------------------------

  private val wordOnly = Pattern.compile("^" + PYW + "+$", UFLAGS)

  /** Builds the T1 alternation pattern from user sequences: each sequence is
    * escaped; sequences of only word characters are wrapped in \b…\b; joined
    * with '|'; compiled case-insensitively. Returns None for empty input. */
  def characterFilterPattern(charsToRemove: Seq[String]): Option[Pattern] =
    if (charsToRemove.isEmpty) None
    else {
      val parts = charsToRemove.map { seq =>
        val esc = reEscape(seq)
        if (wordOnly.matcher(seq).matches())
          s"(?<!$PYW)" + esc + s"(?!$PYW)" // python-\b parity at both ends
        else esc
      }
      Some(
        Pattern.compile(
          parts.mkString("|"),
          Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | UFLAGS
        )
      )
    }

  def characterFilter(pattern: Pattern, text: String): String =
    pattern.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T2 LineBreakNormalizationModule (src/CorpusAid.py:228-242)
  // ---------------------------------------------------------------------

  // fullmatch(\s*\w\s*): a line that is exactly one word char + optional ws
  private val singleCharLine = Pattern.compile("\\s*" + PYW + "\\s*", UFLAGS)
  // soft line break: \n not preceded by ". " and not followed by blank line
  private val softBreak = Pattern.compile("(?<!\\.\\s)\\n(?!\\s*\\n)", UFLAGS)
  private val multiSpace = Pattern.compile("\\s{2,}", UFLAGS)

  def normalizeLineBreaks(text: String): String = {
    val kept = pySplitLines(text).filterNot(l => singleCharLine.matcher(l).matches())
    val joined = kept.mkString("\n")
    val unwrapped = softBreak.matcher(joined).replaceAll(" ")
    pyStrip(multiSpace.matcher(unwrapped).replaceAll(" "))
  }

  // ---------------------------------------------------------------------
  // T3 PageNumberRemovalModule (src/CorpusAid.py:245-250)
  // ---------------------------------------------------------------------

  private val pageNumber =
    Pattern.compile("(?md)^\\s*\\d{1,4}\\s*$", UFLAGS) // (?d): ^$ at \n only, like python
  def removePageNumbers(text: String): String =
    pageNumber.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T4 RomanPageNumberRemovalModule (src/CorpusAid.py:253-263)
  // ---------------------------------------------------------------------

  private val romanPage =
    Pattern.compile("(?md)^\\s*[IiVvXxLlCcDdMm]{1,7}\\s*$", UFLAGS)
  def removeRomanPageNumbers(text: String): String =
    romanPage.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T5 PageIndicatorRemovalModule (src/CorpusAid.py:266-273)
  // ---------------------------------------------------------------------

  private val pageIndicator = Pattern.compile(
    s"(?<!$PYW)" + "(?:[Pp]age|[Pp]ag\\.?)\\s+(?:\\d+|[IVXLCDM]+)" + s"(?!$PYW)",
    UFLAGS)
  def removePageIndicators(text: String): String =
    pageIndicator.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T6 PageDelimiterRemovalModule (src/CorpusAid.py:276-282)
  // ---------------------------------------------------------------------

  private val pageDelimiter = Pattern.compile("---\\s*Page\\s+\\d+\\s*---", UFLAGS)
  def removePageDelimiters(text: String): String =
    pageDelimiter.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T7 WhitespaceNormalizationModule (src/CorpusAid.py:285-306)
  // Nine substitutions in this exact order — order is semantics-bearing.
  // ---------------------------------------------------------------------

  private val wsBeforePunct = Pattern.compile("\\s+([.,?!;:])", UFLAGS)
  private val punctNoSpace = Pattern.compile("([.,?!;:])(\\S)", UFLAGS)
  private val afterOpenParen = Pattern.compile("\\(\\s+", UFLAGS)
  private val beforeCloseParen = Pattern.compile("\\s+\\)", UFLAGS)
  private val afterOpenBracket = Pattern.compile("\\[\\s+", UFLAGS)
  private val beforeCloseBracket = Pattern.compile("\\s+\\]", UFLAGS)
  private val afterOpenBrace = Pattern.compile("\\{\\s+", UFLAGS)
  private val beforeCloseBrace = Pattern.compile("\\s+\\}", UFLAGS)

  def normalizeSpacing(text: String): String = {
    var t = text
    t = wsBeforePunct.matcher(t).replaceAll("$1")
    t = punctNoSpace.matcher(t).replaceAll("$1 $2")
    t = afterOpenParen.matcher(t).replaceAll("(")
    t = beforeCloseParen.matcher(t).replaceAll(")")
    t = afterOpenBracket.matcher(t).replaceAll("[")
    t = beforeCloseBracket.matcher(t).replaceAll("]")
    t = afterOpenBrace.matcher(t).replaceAll("{")
    t = beforeCloseBrace.matcher(t).replaceAll("}")
    t = multiSpace.matcher(t).replaceAll(" ")
    pyStrip(t)
  }

  // ---------------------------------------------------------------------
  // T8 LineBreakRemovalModule (src/CorpusAid.py:309-311)
  // ---------------------------------------------------------------------

  def removeBreakLines(text: String): String = text.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // T9 BibliographicalReferenceRemovalModule (src/CorpusAid.py:314-319)
  // ---------------------------------------------------------------------

  private val bibRef =
    Pattern.compile("\\([A-Z][a-z]+(?:[^()]*?\\d{4}[^()]*?)?\\)", UFLAGS)
  def removeBibliographicalReferences(text: String): String =
    bibRef.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T10 LowercaseModule (src/CorpusAid.py:322-324)
  // ---------------------------------------------------------------------

  // CPython's str.lower() final-sigma context rule (unicodeobject.c
  // handle_capital_sigma): Σ → ς iff scanning BACKWARD over Case_Ignorable
  // chars finds a Cased char AND scanning FORWARD over Case_Ignorable chars
  // finds none. Java's SpecialCasing evaluation disagrees on several edge
  // contexts (found by the fuzz battery, e.g. "²Σ-"), so sigmas are resolved
  // here first and the rest delegated to toLowerCase(ROOT).

  @inline private def isCasedCp(cp: Int): Boolean =
    Character.isLowerCase(cp) || Character.isUpperCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  @inline private def isCaseIgnorableCp(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
    t == Character.FORMAT || t == Character.MODIFIER_LETTER ||
    t == Character.MODIFIER_SYMBOL ||
    // WordBreak MidLetter / MidNumLet / Single_Quote members
    cp == '\'' || cp == '.' || cp == ':' || cp == 0xB7 || cp == 0x387 ||
    cp == 0x5F4 || cp == 0x2018 || cp == 0x2019 || cp == 0x2024 ||
    cp == 0x2027 || cp == 0xFE13 || cp == 0xFE52 || cp == 0xFE55 ||
    cp == 0xFF07 || cp == 0xFF0E || cp == 0xFF1A
  }

  private def isFinalSigma(s: String, i: Int): Boolean = {
    var j = i - 1
    var precededByCased = false
    while (j >= 0 && !precededByCased) {
      val cp = s.codePointBefore(j + 1)
      if (isCaseIgnorableCp(cp)) j -= Character.charCount(cp)
      else { precededByCased = isCasedCp(cp); j = -1 }
    }
    if (!precededByCased) return false
    var k = i + 1
    while (k < s.length) {
      val cp = s.codePointAt(k)
      if (isCaseIgnorableCp(cp)) k += Character.charCount(cp)
      else return !isCasedCp(cp)
    }
    true
  }

  def lowercase(text: String): String = {
    if (text.indexOf('\u03a3') < 0) return text.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\u03a3')
        sb.append(if (isFinalSigma(text, i)) '\u03c2' else '\u03c3')
      else sb.append(c)
      i += 1
    }
    sb.toString.toLowerCase(Locale.ROOT)
  }

  // ---------------------------------------------------------------------
  // T11 RegexSubstitutionModule (src/CorpusAid.py:343-366)
  // User pattern compiled with DOTALL; replacement is "". Compilation is
  // validated at plan-build time (CleanConfig.validated); per-row never throws.
  // ---------------------------------------------------------------------

  def compileUserPattern(pattern: String): Pattern =
    Pattern.compile(pattern, Pattern.DOTALL | UFLAGS)

  def regexSubstitute(pattern: Pattern, text: String): String =
    pattern.matcher(text).replaceAll("")

  // ---------------------------------------------------------------------
  // T12 WordTokenizationModule (src/CorpusAid.py:369-373)
  //
  // The reference tokenizes with spaCy's statistical tokenizer, which is not
  // reproducible on the JVM. OUR spec (SURVEY.md §7.4 item 3, authoritative
  // for golden labels): a token is either
  //   - a run of Unicode word chars, optionally containing internal
  //     apostrophes ('  ’) between word chars, with the common English
  //     contraction suffixes ('d 'll 'm 're 's 've n't, either apostrophe)
  //     detached as their own token (mirrors spaCy's tokenizer_exceptions for
  //     the dominant cases), or
  //   - a single non-word, non-space character.
  // ---------------------------------------------------------------------

  private val tokenPattern =
    Pattern.compile("\\w+(?:['’]\\w+)*|[^\\w\\s]", UFLAGS)

  private val contractionSuffix =
    Pattern.compile("(?i)(.+?)(n['’]t|['’](?:d|ll|m|re|s|ve))$", UFLAGS)

  /** Tokenize per OUR deterministic spec; returns the token array. */
  def tokenize(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = tokenPattern.matcher(text)
    while (m.find()) {
      val tok = m.group()
      val cm = contractionSuffix.matcher(tok)
      if (cm.matches()) { out += cm.group(1); out += cm.group(2) }
      else out += tok
    }
    out.toArray
  }

  /** T12: tokenize and re-join with single spaces (" ".join(tokens),
    * src/CorpusAid.py:373). */
  def wordTokenization(text: String): String = tokenize(text).mkString(" ")

  // ---------------------------------------------------------------------
  // T13 StopWordRemovalModule (src/CorpusAid.py:376-382)
  // Tokenize, drop tokens whose lower-case form is a stop word; the pipeline
  // joins the surviving list with " " (src/CorpusAid.py:441-443).
  // ---------------------------------------------------------------------

  def removeStopWords(text: String): String =
    tokenize(text)
      .filterNot(t => StopWords.contains(t.toLowerCase(Locale.ROOT)))
      .mkString(" ")

  // ---------------------------------------------------------------------
  // T14 HTMLStripperModule (src/CorpusAid.py:385-387)
  //
  // BeautifulSoup(text,"html.parser").get_text() concatenates text nodes with
  // no separator, drops tags/comments, keeps <script>/<style> CONTENT OUT
  // (html.parser exposes them but get_text skips nothing — it includes script
  // text; BS4's get_text does include script/style text, so we keep it too for
  // parity), and decodes entities. OUR spec: comments and tags removed (with
  // quoted-attribute awareness), entities decoded for the HTML4 core set and
  // numeric references. Exact BS4 parity on malformed markup is out of scope
  // (SURVEY.md §7.4 item 4).
  // ---------------------------------------------------------------------

  private val htmlComment = Pattern.compile("<!--.*?-->", Pattern.DOTALL)
  // A tag: '<' then either quoted strings or non-'>' chars, then '>'.
  private val htmlTag =
    Pattern.compile("</?[A-Za-z!][^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*>")
  private val entityRef = Pattern.compile("&(#x?[0-9A-Fa-f]+|[A-Za-z][A-Za-z0-9]*);")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "deg" -> "°", "plusmn" -> "±",
    "times" -> "×", "divide" -> "÷", "laquo" -> "«",
    "raquo" -> "»", "sect" -> "§", "para" -> "¶",
    "middot" -> "·", "bull" -> "•", "dagger" -> "†",
    "trade" -> "™", "euro" -> "€", "pound" -> "£",
    "cent" -> "¢", "yen" -> "¥"
  )

  def decodeEntities(text: String): String = {
    val m = entityRef.matcher(text)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(text, last, m.start())
      val body = m.group(1)
      val decoded: String =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
          catch { case _: Exception => m.group() }
        else if (body.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(body.substring(1))))
          catch { case _: Exception => m.group() }
        else namedEntities.getOrElse(body, m.group())
      sb.append(decoded)
      last = m.end()
    }
    sb.append(text, last, text.length)
    sb.toString
  }

  def stripHtml(text: String): String = {
    var t = htmlComment.matcher(text).replaceAll("")
    t = htmlTag.matcher(t).replaceAll("")
    decodeEntities(t)
  }

  // ---------------------------------------------------------------------
  // T15 DiacriticRemovalModule (src/CorpusAid.py:390-396)
  // NFD-normalize then drop category Mn. Both sides implement UAX#15 ⇒
  // byte-exact parity.
  // ---------------------------------------------------------------------

  def removeDiacritics(text: String): String = {
    val nfd = Normalizer.normalize(text, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // T16/T17/T19 char-class filters (src/CorpusAid.py:399-429,673-675)
  //
  // Implemented as ONE fused single-pass kernel — the three reference modules
  // are adjacent pipeline stages (16-18 in the fixed order, src/CorpusAid.py:
  // 668-675) with no intervening stage, so fusing them is semantics-preserving
  // and saves two full string traversals (SURVEY.md §7.5 perf item).
  // ---------------------------------------------------------------------

  @inline private def nameStartsWith(cp: Int, prefix: String): Boolean = {
    val n = Character.getName(cp)
    n != null && n.startsWith(prefix)
  }

  def charClassFilter(
      text: String,
      dropGreek: Boolean,
      dropCyrillic: Boolean,
      dropSuperSub: Boolean
  ): String = {
    if (!dropGreek && !dropCyrillic && !dropSuperSub) return text
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val tpe = Character.getType(cp)
      val drop =
        (dropSuperSub && (tpe == Character.OTHER_NUMBER || tpe == Character.MODIFIER_SYMBOL)) ||
          (dropGreek && nameStartsWith(cp, "GREEK")) ||
          (dropCyrillic && nameStartsWith(cp, "CYRILLIC"))
      if (!drop) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def removeGreek(text: String): String =
    charClassFilter(text, dropGreek = true, dropCyrillic = false, dropSuperSub = false)
  def removeCyrillic(text: String): String =
    charClassFilter(text, dropGreek = false, dropCyrillic = true, dropSuperSub = false)
  def removeSuperSubScript(text: String): String =
    charClassFilter(text, dropGreek = false, dropCyrillic = false, dropSuperSub = true)

  // ---------------------------------------------------------------------
  // T18 UnicodeNormalizationModule (src/CorpusAid.py:415-417)
  // ---------------------------------------------------------------------

  def normalizeUnicode(text: String): String =
    Normalizer.normalize(text, Normalizer.Form.NFKC)

  // ---------------------------------------------------------------------
  // Word counts (report aggregation, SURVEY.md §2.3)
  // ---------------------------------------------------------------------

  /** Mode A: `len(text.split())` — Python split() on whitespace runs,
    * ignoring leading/trailing (src/CorpusAid.py:1800-1802). */
  def splitWordCount(text: String): Int = {
    var count = 0
    var inTok = false
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (pyIsSpace(cp)) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += Character.charCount(cp)
    }
    count
  }

  /** Mode B: UAX#29 word segments containing an alphanumeric, matching Rust's
    * `unicode_words` (rust_preview/src/lib.rs:59-65). */
  def uax29WordCount(text: String): Int = {
    val it = java.text.BreakIterator.getWordInstance(Locale.ROOT)
    it.setText(text)
    var count = 0
    var start = it.first()
    var end = it.next()
    while (end != java.text.BreakIterator.DONE) {
      var i = start
      var hasAlnum = false
      while (i < end && !hasAlnum) {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasAlnum = true
        i += Character.charCount(cp)
      }
      if (hasAlnum) count += 1
      start = end
      end = it.next()
    }
    count
  }

  /** UTF-8 byte length (report total_size, src/CorpusAid.py:1798). */
  def utf8Length(text: String): Int =
    text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
}
