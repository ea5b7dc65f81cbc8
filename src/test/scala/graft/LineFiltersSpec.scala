package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.LineFilters

/** C4 line filters (q81): every line rule and doc-drop branch
  * hand-checked, ASCII-fold edge cases, and the DataFrame pass.
  */
class LineFiltersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("line keeps: terminal punctuation, min words, javascript") {
    val r = LineFilters.filter(
      "A good long sentence here.\n" + // kept
        "no terminal punctuation\n" + // dropped: no terminal
        "Too short.\n" + // dropped: 2 words
        "Enable JavaScript to continue please.\n" + // dropped: javascript
        "Ends with a question?\n" + // kept
        "Quoted line stays here \"\n" + // kept (ends in ")
        "") // dropped: empty
    assert(r.nLinesIn === 7)
    assert(r.nLinesKept === 3)
    assert(r.cleaned === "A good long sentence here.\nEnds with a question?\nQuoted line stays here \"")
    assert(r.docKeep && r.dropReason == null)
  }

  test("doc drops in order: lorem_ipsum beats brace beats too_few_lines") {
    val both = LineFilters.filter("has Lorem Ipsum and a { brace.")
    assert(both.dropReason === "lorem_ipsum" && !both.docKeep)
    val brace = LineFilters.filter("var x = { a: 1 } etc.")
    assert(brace.dropReason === "brace")
    val few = LineFilters.filter("One good line survives here.\nshort.\n")
    assert(few.dropReason === "too_few_lines")
    assert(few.nLinesKept === 1)
  }

  test("ASCII-only case fold: LOREM IPSUM caught, Turkish dotted I ignored") {
    assert(LineFilters.filter("xx LOREM IPSUM yy").dropReason === "lorem_ipsum")
    assert(LineFilters.asciiLower("LOREM İPSUM") === "lorem İpsum")
    // the non-ASCII fold must NOT fire the rule (locale-free contract)
    val r = LineFilters.filter(
      "lorem İpsum is not the phrase honestly.\n" +
        "Another fine long sentence.\nAnd a third one too.")
    assert(r.docKeep)
  }

  test("null / empty docs: one empty line, zero kept, too_few_lines") {
    val viaDf = LineFilters(spark,
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
      .as[(Long, String, Long, Long, Boolean, String)].head()
    assert(viaDf === ((1L, "", 1L, 0L, false, "too_few_lines")))
  }

  test("DataFrame pass is partition-invariant") {
    val d = Seq.tabulate(30)(i => (i.toLong,
      s"Line number $i is long enough.\nshort.\nAnother keeper sentence right here.\nAnd one more to clear the bar.")).toDF("doc_id", "text")
    val one = LineFilters(spark, d.repartition(1), "text").orderBy("doc_id").collect()
    val many = LineFilters(spark, d.repartition(7), "text").orderBy("doc_id").collect()
    assert(one === many)
    assert(one.forall(_.getAs[Boolean]("doc_keep")))
  }
}
