package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.transcript.{Boilerplate, ContextBudget, CrossTurn, ToolLoops}

/** Transcript signal operators q97-q100: cross-turn repetition, assistant
  * boilerplate/refusal, tool-call loops, context-window truncation. The
  * oracles recompute all four in DuckDB over the committed raw dump; this
  * suite covers the operator contracts, injection coverage, and the
  * one-exchange plan shapes.
  */
class TranscriptSignalsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def turnsDF(
      rows: Seq[(String, Int, String, String, String, Long)]): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_ms")

  // ---- CrossTurn ---------------------------------------------------------

  test("cross-turn: occurrence index, echo distance, dup flags, short-ack") {
    val rows = Seq(
      ("c1", 0, "user", "hello there friend", "", 1000L),
      ("c1", 1, "assistant", "hello there friend", "", 2000L),
      ("c1", 2, "user", "what about the weather", "", 3000L),
      ("c1", 3, "assistant", "hello there friend", "", 4000L),
      ("c1", 4, "user", "ok", "", 5000L),
      ("c1", 5, "assistant", "ok", "", 6000L))
    val out = CrossTurn.signals(spark, turnsDF(rows))
      .orderBy("turn_idx").collect()
    def r(i: Int) = out(i)
    assert(r(0).getAs[Long]("occ") === 1L && r(0).getAs[Boolean]("keep"))
    // t1: exact repeat of previous turn
    assert(r(1).getAs[Long]("occ") === 2L)
    assert(r(1).getAs[Boolean]("dup_of_prev"))
    assert(r(1).getAs[Long]("repeat_dist") === 1L)
    assert(!r(1).getAs[Boolean]("keep"))
    // t3: repeat at distance 3, invisible to lag-1 but not to occ; also a
    // same-role repeat (previous assistant turn had the same text)
    assert(r(3).getAs[Long]("occ") === 3L)
    assert(!r(3).getAs[Boolean]("dup_of_prev"))
    assert(r(3).getAs[Boolean]("dup_of_role_prev"))
    assert(r(3).getAs[Long]("repeat_dist") === 3L)
    assert(!r(3).getAs[Boolean]("keep"))
    // t5: second "ok" is a short acknowledgement — repeat but kept
    assert(r(5).getAs[Long]("occ") === 2L && r(5).getAs[Boolean]("keep"))
    // t0/t1 form an identical-text run of 2
    assert(r(0).getAs[Long]("run_len") === 2L)
    assert(r(1).getAs[Long]("run_len") === 2L)
    assert(r(2).getAs[Long]("run_len") === 1L)
  }

  test("cross-turn: generator corpus has verbatim repeats; rows preserved") {
    val t = synthTurnsMs(300)
    val out = CrossTurn.signals(spark, t)
    assert(out.count() === t.count())
    assert(out.where("occ > 1").count() > 0L,
      "the generator's cross-turn repeat branch must be detected")
    assert(out.where("dup_of_prev").count() > 0L)
    // first occurrences are always kept
    assert(out.where("occ = 1 AND NOT keep").count() === 0L)
  }

  // ---- Boilerplate --------------------------------------------------------

  test("boilerplate: pattern counts on assistant turns only; keep rule") {
    val rows = Seq(
      ("b1", 0, "user", "As an AI I wonder — can you help?", "", 1000L),
      ("b1", 1, "assistant",
        "I'm sorry, but I cannot help with that request.", "", 2000L),
      ("b1", 2, "user", "why not?", "", 3000L),
      ("b1", 3, "assistant",
        "As an AI language model, I cannot browse. " +
          "Is there anything else I can help you with?", "", 4000L),
      ("b2", 0, "user", "draft it", "", 1000L),
      ("b2", 1, "assistant", "Here: [insert name here] signs below.", "", 2000L),
      ("b2", 2, "user", "thanks", "", 3000L),
      ("b2", 3, "assistant", "done and shipped", "", 4000L),
      ("b2", 5, "assistant", "anything more?", "", 5000L),
      ("b2", 7, "assistant", "closing the thread now", "", 6000L))
    val out = Boilerplate.signals(spark, turnsDF(rows))
      .orderBy("conv_id").collect()
    val b1 = out(0)
    // user mention of "As an AI" is NOT counted (role filter)
    assert(b1.getAs[Long]("n_refusal") === 1L)
    assert(b1.getAs[Long]("n_selfref") === 1L)
    assert(b1.getAs[Long]("n_closing") === 1L)
    assert(b1.getAs[Long]("n_flagged") === 2L)
    assert(b1.getAs[Long]("n_assistant") === 2L)
    assert(!b1.getAs[Boolean]("keep")) // 2*4 > 2
    val b2 = out(1)
    assert(b2.getAs[Long]("n_placeholder") === 1L)
    assert(b2.getAs[Long]("n_flagged") === 1L)
    assert(b2.getAs[Long]("n_assistant") === 4L)
    assert(b2.getAs[Boolean]("keep")) // 1*4 <= 4
  }

  test("boilerplate: injection exercises every pattern on the generator") {
    val out = Boilerplate.signals(spark,
      Boilerplate.inject(synthTurnsMs(400)))
    val sums = out.agg(
      org.apache.spark.sql.functions.sum("n_refusal"),
      org.apache.spark.sql.functions.sum("n_selfref"),
      org.apache.spark.sql.functions.sum("n_closing"),
      org.apache.spark.sql.functions.sum("n_placeholder")).head()
    Boilerplate.patterns.indices.foreach { i =>
      assert(sums.getLong(i) > 0L,
        s"pattern ${Boilerplate.patterns(i)._1} never fired — fixture rule")
    }
    assert(out.where("NOT keep").count() > 0L)
    assert(out.where("keep").count() > 0L)
  }

  // ---- ToolLoops ----------------------------------------------------------

  test("tool loops: a 3-run of identical calls flags; a retry pair does not") {
    val call = "{\"q\":\"weather\"}"
    val rows = Seq(
      ("t1", 0, "user", "check the weather", "", 1000L),
      ("t1", 1, "tool", call, "search", 2000L),
      ("t1", 2, "tool", call, "search", 3000L),
      ("t1", 3, "tool", call, "search", 4000L),
      ("t1", 4, "assistant", "rain tomorrow", "", 5000L),
      ("t2", 0, "user", "check it", "", 1000L),
      ("t2", 1, "tool", call, "search", 2000L),
      ("t2", 2, "tool", call, "search", 3000L),
      ("t2", 3, "assistant", "done", "", 4000L),
      // identical consecutive ASSISTANT texts are a repetition problem,
      // not a tool loop
      ("t3", 0, "assistant", "same words", "", 1000L),
      ("t3", 1, "assistant", "same words", "", 2000L),
      ("t3", 2, "assistant", "same words", "", 3000L))
    val out = ToolLoops.signals(spark, turnsDF(rows))
      .orderBy("conv_id").collect()
    val t1 = out(0)
    assert(t1.getAs[Long]("max_call_run") === 3L)
    assert(t1.getAs[Long]("n_loops") === 1L)
    assert(t1.getAs[Long]("loop_turns") === 3L)
    assert(!t1.getAs[Boolean]("keep"))
    val t2 = out(1)
    assert(t2.getAs[Long]("max_call_run") === 2L)
    assert(t2.getAs[Long]("n_loops") === 0L)
    assert(t2.getAs[Boolean]("keep"))
    val t3 = out(2)
    assert(t3.getAs[Long]("n_tool_calls") === 0L)
    assert(t3.getAs[Long]("max_call_run") === 0L)
    assert(t3.getAs[Boolean]("keep"))
  }

  test("tool loops: different args break the run") {
    val rows = Seq(
      ("u1", 0, "tool", "{\"q\":\"a\"}", "search", 1000L),
      ("u1", 1, "tool", "{\"q\":\"b\"}", "search", 2000L),
      ("u1", 2, "tool", "{\"q\":\"c\"}", "search", 3000L))
    val out = ToolLoops.signals(spark, turnsDF(rows)).collect()
    assert(out.head.getAs[Long]("max_call_run") === 1L)
    assert(out.head.getAs[Boolean]("keep"))
  }

  test("tool loops: generator injection plants loops; clean convs untouched") {
    val t = synthTurnsMs(300)
    val out = ToolLoops.signals(spark, ToolLoops.inject(t))
    assert(out.where("NOT keep").count() > 0L, "injected loops must flag")
    // conversations outside the cv%6==5 key must be loop-free (the
    // generator never emits 3 identical consecutive tool calls naturally)
    val clean = out.where(
      "cast(substring(conv_id, 6) as bigint) % 6 <> 5 AND n_loops > 0")
    assert(clean.count() === 0L)
  }

  // ---- ContextBudget ------------------------------------------------------

  test("context budget: recent suffix kept, anchor exempt, reindex dense") {
    val long50 = "x" * 50 // weight 66
    val rows = Seq(
      ("k1", 0, "user", long50, "", 1000L),
      ("k1", 1, "assistant", long50, "", 2000L),
      ("k1", 2, "user", long50, "", 3000L),
      ("k1", 3, "assistant", long50, "", 4000L))
    val out = ContextBudget.truncate(spark, turnsDF(rows), budgetBytes = 100L)
      .orderBy("turn_idx").collect()
    // from the end: t3 cum 66 (kept), t2 cum 132 (cut), t1 198, t0 264 but
    // t0 is the anchor
    assert(out.map(_.getAs[Long]("cum_from_end")).toSeq ===
      Seq(264L, 198L, 132L, 66L))
    assert(out.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, false, true))
    assert(out(0).getAs[Int]("new_idx") === 0)
    assert(out(3).getAs[Int]("new_idx") === 1)
    assert(out(1).isNullAt(out(1).fieldIndex("new_idx")))
  }

  test("context budget: weight is UTF-8 bytes, not chars") {
    val greek = "αβγ" // 3 chars, 6 bytes
    val rows = Seq(("m1", 0, "user", greek, "", 1000L))
    val out = ContextBudget.truncate(spark, turnsDF(rows)).collect()
    assert(out.head.getAs[Long]("weight") === 22L)
  }

  test("context budget: large budget keeps everything in order") {
    val t = synthTurnsMs(100)
    val out = ContextBudget.truncate(spark, t, budgetBytes = Long.MaxValue / 2)
    assert(out.where("NOT kept").count() === 0L)
    // new_idx is the original rank: 0..n-1 per conversation
    assert(out.where("new_idx IS NULL").count() === 0L)
    val bad = out.groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.max("new_idx").as("mx"),
        org.apache.spark.sql.functions.count(col("new_idx")).as("n"))
      .where("mx <> n - 1")
    assert(bad.count() === 0L)
  }

  // ---- plan shapes --------------------------------------------------------

  test("plan shapes: every q97-q100 operator costs ONE exchange") {
    val t = synthTurnsMs(200)
    def nExchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(nExchanges(CrossTurn.signals(spark, t)) === 1)
    assert(nExchanges(Boilerplate.signals(spark, Boilerplate.inject(t))) === 1)
    assert(nExchanges(ToolLoops.signals(spark, ToolLoops.inject(t))) === 1)
    assert(nExchanges(ContextBudget.truncate(spark, t)) === 1)
  }

  /** Generator turns with ts projected to epoch ms (the q87-q100 shape). */
  private def synthTurnsMs(nConvs: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.gen.TranscriptGen.dataset(spark, nConvs.toLong, megaTurns = 60)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
  }
}
