package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.RpSignals

/** RedPajama-V2 residual signals (q85): hand-computed entropy/case/line
  * batteries and the keep verdict's integer thresholds. The q85 oracle
  * (independent Python chain, tools/gen_rp_golden.py) pins end-to-end
  * values at sf0.01; this suite covers the operator semantics.
  */
class RpSignalsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def micro(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  test("unigram entropy: all-unique words hit micro(ln N) exactly") {
    val s = RpSignals.signals("a b c d", Set.empty)
    assert(s.nWords === 4L)
    assert(s.nUnique === 4L)
    assert(s.entMicro === micro(4)) // sum c*micro(1) = 0
  }

  test("unigram entropy: a constant doc is exactly zero") {
    val s = RpSignals.signals("x x x x x", Set.empty)
    // micro(5) - (5 * micro(5)) / 5 = 0, exactly, by construction
    assert(s.entMicro === 0L)
  }

  test("unigram entropy: Long floor division, hand-computed mix") {
    val s = RpSignals.signals("a a b", Set.empty)
    // micro(3) - (2*micro(2) + 1*micro(1)) / 3 = 1098612 - 1386294/3
    assert(s.entMicro === 1098612L - 1386294L / 3L)
  }

  test("all-caps / no-alph words: CPython isupper + ASCII-letter parity") {
    val s = RpSignals.signals("AB C2D Abc 404 x• - ok", Set.empty)
    assert(s.nWords === 7L)
    assert(s.nAllCaps === 2L) // AB, C2D (no lowercase, has a letter)
    assert(s.nNoAlph === 2L) // 404, -   (x• has a letter)
  }

  test("ellipsis and bullet line counts") {
    val s = RpSignals.signals("• a\nb ...\nc…\n- d\nplain", Set.empty)
    assert(s.nLines === 5L)
    assert(s.ellipsisLines === 2L) // "b ...", "c…"
    assert(s.bulletLines === 2L) // "• a", "- d"
  }

  test("blocked words counted with ASCII case fold") {
    val s = RpSignals.signals("BlockedAlpha ok blockedbeta BLOCKEDBETA",
      Set("blockedalpha", "blockedbeta"))
    assert(s.listHits === 3L)
  }

  test("empty text: zero words, one empty line, entropy zero") {
    val s = RpSignals.signals("", Set.empty)
    assert(s.nWords === 0L)
    assert(s.entMicro === 0L)
    assert(s.nLines === 1L)
    assert(s.bulletLines === 0L)
  }

  test("keep verdict: each rule flips independently") {
    val ok = RpSignals.signals(
      "one two three four five six seven eight nine ten", Set.empty)
    assert(RpSignals.keep(ok))
    // entropy + unique fail: one word repeated
    assert(!RpSignals.keep(RpSignals.signals(("w " * 40).trim, Set.empty)))
    // all-caps fail
    assert(!RpSignals.keep(RpSignals.signals(
      "ONE TWO THREE four five six seven eight nine ten", Set.empty)))
    // no-alph fail
    assert(!RpSignals.keep(RpSignals.signals(
      "1 2 3 four five six seven eight nine ten", Set.empty)))
    // ellipsis fail (every line ends with ...)
    assert(!RpSignals.keep(RpSignals.signals(
      "one two three four five six seven eight nine ten ...", Set.empty)))
    // bullet fail
    assert(!RpSignals.keep(RpSignals.signals(
      "• one two three four five six seven eight nine ten", Set.empty)))
    // blocked fail
    assert(!RpSignals.keep(RpSignals.signals(
      "one two three four five six seven eight nine blockedalpha",
      Set("blockedalpha"))))
  }

  test("signal plan is a single narrow pass — no Exchange") {
    val docs = (0L until 20L).map(i => (i, s"alpha beta gamma $i"))
      .toDF("doc_id", "text")
    val plan = RpSignals(spark, docs, "text", Set("blockedalpha"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
