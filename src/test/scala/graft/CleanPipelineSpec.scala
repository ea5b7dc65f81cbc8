package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CleanText
import graft.model.CleanConfig
import graft.pipeline.CleanPipeline

/** The three executions of the same plan — fused kernel closure, built-in
  * Catalyst column chain, native CleanText expression — must agree row-wise,
  * plus reference-contract properties (identity short-circuit, ordering,
  * idempotence of normalizers). */
class CleanPipelineSpec extends AnyFunSuite with SparkTestBase {

  /** Deterministic ScalaCheck sampling (no scalatestplus in the offline
    * cache): 300 samples from a fixed seed. */
  private def forAllSampled(gen: Gen[String])(check: String => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < 300) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val texts: Seq[String] = Seq(
    "",
    "   ",
    "Hello,World ! How are  you ?",
    "line one\nline two\n\npara two. \nnew sentence",
    " 42 \n1234\ntext 42 inline\nxiv\nPage 12 here",
    "--- Page 3 ---\n(Smith 2020) says ( spaced ) [ x ]",
    "João é über naïve αβγ Привет x² H₂O ﬁne Ａ",
    "<p>a <b>b</b></p> &amp; more",
    "The cat and THE dog don't RUN",
    "a\nb\nsingle char lines\n1\n\nkeep this"
  )

  private val configs: Seq[(String, CleanConfig)] = Seq(
    "identity" -> CleanConfig(),
    "all_on" -> CleanConfig.allOn,
    "normalizers" -> CleanConfig(normalizeUnicode = true, removeDiacritics = true,
      normalizeSpacing = true, normalizeLineBreaks = true),
    "page_artifacts" -> CleanConfig(removePageNumbers = true,
      removeRomanPageNumbers = true, removePageIndicators = true,
      removePageDelimiters = true, removeBibliographicalReferences = true),
    "tokenize_stop" -> CleanConfig(wordTokenization = true, removeStopWords = true,
      lowercase = true),
    "char_filter" -> CleanConfig(charsToRemove = Seq("foo", "e.g.", "$")),
    "user_regex" -> CleanConfig(regexPattern = "\\d{4}"),
    "scripts" -> CleanConfig(removeGreek = true, removeCyrillic = true,
      removeSuperSubScript = true, stripHtml = true)
  )

  test("kernelChain == columnChain == CleanText expression, per row") {
    import spark.implicits._
    val df = texts.toDF("text").cache()
    for ((name, cfg) <- configs) {
      val kernel = CleanPipeline.kernelChain(cfg)
      val viaColumns = df
        .withColumn("out", CleanPipeline.columnChain(cfg)(col("text")))
        .select("text", "out").collect()
      val viaExpr = df
        .withColumn("out", CleanText(col("text"), cfg))
        .select("text", "out").collect()
      viaColumns.zip(viaExpr).foreach { case (rc, re) =>
        val in = rc.getString(0)
        val expected = kernel(in)
        assert(rc.getString(1) === expected, s"columnChain mismatch cfg=$name in=$in")
        assert(re.getString(1) === expected, s"CleanText mismatch cfg=$name in=$in")
      }
    }
  }

  test("identity config returns input byte-identically (no strip)") {
    val k = CleanPipeline.kernelChain(CleanConfig())
    assert(k("  raw \n") === "  raw \n")
    assert(CleanPipeline.stages(CleanConfig()).isEmpty)
  }

  test("CleanText is null-safe") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("text")
    val out = df.select(CleanText(col("text"), CleanConfig.allOn)).collect()
    assert(out(1).isNullAt(0))
  }

  test("stage order follows the reference fixed plan shape (T22)") {
    val names = CleanPipeline.stages(CleanConfig.allOn).map(_.name)
    assert(names === Seq(
      "normalize_unicode", "remove_diacritics", "normalize_spacing",
      "normalize_line_breaks", "remove_break_lines",
      "remove_page_numbers", "remove_roman_page_numbers",
      "remove_page_indicators", "remove_page_delimiters",
      "remove_bibliographical_references", "lowercase", "strip_html",
      "word_tokenization", "remove_stop_words", "char_class_filter"))
  }

  test("invalid user regex fails at plan build, not per row") {
    intercept[java.util.regex.PatternSyntaxException] {
      CleanConfig(regexPattern = "([unclosed").validated
    }
  }

  private val genText: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\n", "\t", "  ", "\n\n", ". "),
      Gen.oneOf("é", "ü", "α", "Ж", "²", "ﬁ", "Σ", "ς", "."),
      Gen.oneOf("(Smith 2020)", "Page 7", "42", "xiv", "<b>t</b>", "don't")
    )
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
  }

  test("property: normalizers idempotent; chain deterministic") {
    val norm = CleanPipeline.kernelChain(CleanConfig(normalizeUnicode = true,
      removeDiacritics = true, normalizeSpacing = true))
    val full = CleanPipeline.kernelChain(CleanConfig.allOn)
    forAllSampled(genText) { s =>
      val once = norm(s)
      assert(norm(once) === once)
      assert(full(s) === full(s))
    }
  }

  test("property: fused kernel equals per-stage fold + strip") {
    val cfg = CleanConfig.allOn
    val stages = CleanPipeline.stages(cfg)
    val fused = CleanPipeline.kernelChain(cfg)
    forAllSampled(genText) { s =>
      val folded = graft.kernel.TextKernels.pyStrip(
        stages.foldLeft(s)((t, st) => st.kernel(t)))
      assert(fused(s) === folded)
    }
  }
}
