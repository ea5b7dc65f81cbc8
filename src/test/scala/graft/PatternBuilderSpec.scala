package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PatternBuilder._

/** Semantics quoted from the reference wizard (src/CorpusAid.py:1110-1157). */
class PatternBuilderSpec extends AnyFunSuite {

  test("synthesis shapes match the reference") {
    assert(synthesize(Seq(Rule("Page", SingleNumber, end = "0")), wholeWords = false)
      === "Page.*?\\d")
    assert(synthesize(Seq(Rule("fig", MultipleNumbers, end = "x", numberLength = 3)),
      wholeWords = false) === "fig.*?\\d{3}")
    assert(synthesize(Seq(Rule("start", SpecificSequence, end = "end.")), wholeWords = false)
      === "start.*?end\\.")
    assert(synthesize(Seq(
      Rule("a", SingleNumber, end = "0"),
      Rule("b", SpecificSequence, end = "c")), wholeWords = true)
      === "\\b(a.*?\\d|b.*?c)\\b")
  }

  test("rows with empty start or end are dropped (reference :1117 quirk)") {
    assert(synthesize(Seq(
      Rule("  ", SingleNumber, end = "0"),
      Rule("x", SingleNumber, end = ""), // numeric types still need non-empty end
      Rule("keep", SpecificSequence, end = "this")), wholeWords = false)
      === "keep.*?this")
  }

  test("multiple-numbers requires positive length") {
    intercept[IllegalArgumentException] {
      synthesize(Seq(Rule("x", MultipleNumbers, end = "y", numberLength = 0)),
        wholeWords = false)
    }
  }

  test("compiled flags: DOTALL always; IGNORECASE unless case-sensitive") {
    val ci = compile(Seq(Rule("page", SingleNumber, end = "0")),
      wholeWords = false, caseSensitive = false)
    // DOTALL lets .*? cross the newline: matches at 0 ("PAGE\nx7") and 12
    assert(findMatches(ci, "PAGE\nx7 and page 3").map(_._1) === Seq(0, 12))
    val cs = compile(Seq(Rule("page", SingleNumber, end = "0")),
      wholeWords = false, caseSensitive = true)
    assert(findMatches(cs, "PAGE 7 and page 3").size === 1)
  }

  test("test harness returns all match ranges (testPattern analog)") {
    val p = compile(Seq(Rule("a", SpecificSequence, end = "b")),
      wholeWords = false, caseSensitive = true)
    assert(findMatches(p, "a_b a__b nope") === Seq((0, 3), (4, 8)))
  }
}
