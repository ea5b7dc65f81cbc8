package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Repetition

/** Gopher repetition signals (q78): hand-computed line and n-gram
  * batteries, coverage-marking edge cases, threshold verdicts, and
  * partition invariance.
  */
class RepetitionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("line signals: duplicate groups count every member") {
    val s = Repetition.signals("ab\ncd\nab\nef\nab")
    assert(s.nLines === 5L)
    assert(s.nDupLines === 3L) // all three "ab" occurrences
    assert(s.dupLineChars === 6L)
    assert(s.lineChars === 10L)
  }

  test("top n-gram chars: most frequent bigram, ties to smallest") {
    // tokens: a b a b c — bigrams: "a b"x2, "b a"x1, "b c"x1
    val s = Repetition.signals("a b a b c")
    assert(s.nChars === 9L)
    assert(s.topChars(0) === 2L * 3) // "a b" twice, len 3
    // trigrams all unique -> count 1 -> not a repetition signal
    assert(s.topChars(1) === 0L)
  }

  test("dup n-gram coverage: overlapping occurrences mark positions once") {
    // tokens: x y z w v x y z w v  — the 5-gram "x y z w v" occurs twice,
    // covering ALL 10 positions; covered chars = full join length.
    val s = Repetition.signals("x y z w v x y z w v")
    assert(s.dupChars(0) === s.nChars)
    // no 6-gram repeats
    assert(s.dupChars(1) === 0L)
  }

  test("joining space counts only between covered neighbours") {
    // 12 tokens; the 5-gram "a b c d e" repeats at positions 0 and 7,
    // covering 0-4 and 7-11 but not 5,6 ("q","r"): chars = 2*(5 tokens
    // * 1 char + 4 spaces) = 18, not 19 (the q-r gap spaces don't count).
    val s = Repetition.signals("a b c d e q r a b c d e")
    assert(s.dupChars(0) === 18L)
  }

  test("keep verdict: a heavily repeated doc fails, plain prose passes") {
    val repeated = Repetition.signals(Seq.fill(30)("one two three four five").mkString(" "))
    assert(!Repetition.keep(repeated))
    val prose = Repetition.signals(
      "the quick brown fox jumps over a lazy dog while seven wizards brew quirky potions")
    assert(Repetition.keep(prose))
  }

  test("empty / null docs: one empty line, zero n-gram signals, kept") {
    val s = Repetition.signals("")
    assert(s.nLines === 1L && s.nDupLines === 0L && s.nChars === 0L)
    assert(Repetition.keep(s))
    val viaDf = Repetition(spark,
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
      .select("n_lines", "keep").as[(Long, Boolean)].head()
    assert(viaDf === ((1L, true)))
  }

  test("DataFrame pass is partition-invariant") {
    val d = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 3 == 0) "spam spam spam spam spam spam spam spam"
      else s"unique text number $i with ordinary words")).toDF("doc_id", "text")
    val one = Repetition(spark, d.repartition(1), "text").orderBy("doc_id").collect()
    val many = Repetition(spark, d.repartition(7), "text").orderBy("doc_id").collect()
    assert(one === many)
    assert(one.count(!_.getAs[Boolean]("keep")) === 14) // the spam docs
  }
}
