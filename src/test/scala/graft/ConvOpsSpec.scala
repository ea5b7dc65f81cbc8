package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.transcript.ConvOps

/** Conversation-structure operators (q87 audit / q88 repair / q89 context
  * assembly): hand-built conversations exercising every violation branch,
  * the repair/audit fixed point, frame-bounded assembly, partition
  * invariance, and the plan shapes. The q87/q88/q89 oracles recompute the
  * same semantics in DuckDB's window engine over the committed raw dump;
  * this suite covers the operator contracts.
  */
class ConvOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def turnsDF(
      rows: Seq[(String, Int, String, String, String, Long)]): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_ms")

  private val clean = Seq(
    ("c1", 0, "user", "hi", "", 1000L),
    ("c1", 1, "assistant", "hello", "", 2000L),
    ("c1", 2, "user", "do it", "", 3000L),
    ("c1", 3, "tool", "result 42", "calc", 4000L),
    ("c1", 4, "assistant", "done", "", 5000L))

  test("audit: a clean conversation is all-zero and ok") {
    val r = ConvOps.audit(spark, turnsDF(clean)).collect().head
    assert(r.getAs[Long]("n_turns") === 5L)
    assert(r.getAs[Long]("n_user") === 2L)
    assert(r.getAs[Long]("n_assistant") === 2L)
    assert(r.getAs[Long]("n_tool") === 1L)
    Seq("n_empty", "idx_gaps", "idx_dup", "ts_regress", "role_repeat",
      "orphan_tool", "tool_mismatch").foreach { c =>
      assert(r.getAs[Long](c) === 0L, c)
    }
    assert(r.getAs[Boolean]("ok"))
  }

  test("audit: every violation branch counts exactly once") {
    val bad = Seq(
      // idx opens at 1 (gap), then jumps 1->3 (gap)
      ("c2", 1, "user", "a", "", 1000L),
      ("c2", 3, "assistant", "b", "", 2000L),
      ("c2", 3, "assistant", "b", "", 2000L), // exact duplicate (idx_dup; also role_repeat)
      ("c2", 4, "user", "", "", 1500L), // empty text + ts regression
      ("c2", 5, "user", "d", "hammer", 2500L), // role_repeat + tool name on non-tool
      ("c2", 6, "tool", "out", "", 3000L), // tool with no name (mismatch only; follows user = legal)
      ("c2", 7, "tool", "out2", "calc", 3500L)) // tool after tool = orphan
    val r = ConvOps.audit(spark, turnsDF(bad)).collect().head
    assert(r.getAs[Long]("n_turns") === 7L)
    assert(r.getAs[Long]("idx_gaps") === 2L)
    assert(r.getAs[Long]("idx_dup") === 1L)
    assert(r.getAs[Long]("ts_regress") === 1L)
    // duplicate assistant pair + user->user at idx 4->5
    assert(r.getAs[Long]("role_repeat") === 2L)
    assert(r.getAs[Long]("orphan_tool") === 1L)
    // hammer-on-user + nameless tool
    assert(r.getAs[Long]("tool_mismatch") === 2L)
    assert(r.getAs[Long]("n_empty") === 1L)
    assert(!r.getAs[Boolean]("ok"))
  }

  test("audit: a tool conversation opener is an orphan") {
    val rows = Seq(
      ("c3", 0, "tool", "r", "calc", 1000L),
      ("c3", 1, "assistant", "a", "", 2000L))
    val r = ConvOps.audit(spark, turnsDF(rows)).collect().head
    assert(r.getAs[Long]("orphan_tool") === 1L)
  }

  test("repair: dedup, reindex, running-max ts, tool fix, empty drop") {
    val bad = Seq(
      ("c4", 1, "user", "a", "x", 5000L), // tool name stripped
      ("c4", 3, "assistant", "b", "", 2000L), // ts pulled up to 5000
      ("c4", 3, "assistant", "b", "", 2000L), // duplicate collapses
      ("c4", 4, "user", "", "", 6000L), // empty drops
      ("c4", 5, "tool", "out", "", 7000L)) // nameless tool -> 'unknown'
    val out = ConvOps.repair(spark, turnsDF(bad))
      .orderBy("turn_idx").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Int]("turn_idx")).toSeq === Seq(0, 1, 2))
    assert(out.map(_.getAs[Int]("original_idx")).toSeq === Seq(1, 3, 5))
    assert(out.map(_.getAs[Long]("ts_ms")).toSeq === Seq(5000L, 5000L, 7000L))
    assert(out.map(_.getAs[String]("tool")).toSeq === Seq("", "", "unknown"))
  }

  test("repair then audit: all mechanical violations read zero") {
    val t = synthTurnsMs(300)
    val injected = ConvOps.injectViolations(t)
    val audited = ConvOps.audit(spark, ConvOps.repair(spark, injected)
      .drop("original_idx"))
    val agg = audited.selectExpr(
      "sum(idx_gaps)", "sum(idx_dup)", "sum(ts_regress)",
      "sum(n_empty)", "sum(tool_mismatch)").collect().head
    (0 until 5).foreach(i => assert(agg.getLong(i) === 0L, s"col $i"))
  }

  test("injections exercise every audit branch at generator scale") {
    val audited =
      ConvOps.audit(spark, ConvOps.injectViolations(synthTurnsMs(300)))
    val agg = audited.selectExpr(
      "sum(idx_gaps)", "sum(idx_dup)", "sum(ts_regress)",
      "sum(role_repeat)", "sum(orphan_tool)", "sum(tool_mismatch)",
      "sum(n_empty)",
      "sum(case when ok then 1 else 0 end)").collect().head
    (0 until 7).foreach(i => assert(agg.getLong(i) > 0L, s"branch $i never fired"))
    assert(agg.getLong(7) > 0L, "no conversation stayed clean")
  }

  test("lang rollup: majority, tie-break, consistency, conversation keep") {
    val perTurn = Seq(
      // l1: 3/4 en = exactly 75% consistent; 2/4 kept = keep
      ("l1", "en", true), ("l1", "en", true), ("l1", "en", false),
      ("l1", "de", false),
      // l2: 2 en / 2 de tie -> lexicographic winner 'de'; 50% < 75% -> mixed
      ("l2", "en", true), ("l2", "de", true), ("l2", "en", true),
      ("l2", "de", true),
      // l3: consistent but only 1/3 kept -> conv dropped
      ("l3", "fr", false), ("l3", "fr", false), ("l3", "fr", true))
      .toDF("conv_id", "lang", "keep")
    val out = ConvOps.langRollup(spark, perTurn)
      .orderBy("conv_id").collect()
    val l1 = out(0)
    assert(l1.getAs[String]("major_lang") === "en")
    assert(l1.getAs[Long]("major_cnt") === 3L)
    assert(l1.getAs[Long]("n_langs") === 2L)
    assert(l1.getAs[Boolean]("lang_consistent"))
    assert(l1.getAs[Boolean]("conv_keep"))
    val l2 = out(1)
    assert(l2.getAs[String]("major_lang") === "de") // deterministic tie
    assert(!l2.getAs[Boolean]("lang_consistent"))
    assert(!l2.getAs[Boolean]("conv_keep"))
    val l3 = out(2)
    assert(l3.getAs[Boolean]("lang_consistent"))
    assert(!l3.getAs[Boolean]("conv_keep")) // 1*2 < 3
  }

  test("assemble: frame-bounded context in turn order") {
    val out = ConvOps.assemble(spark, turnsDF(clean), ctxTurns = 2)
      .orderBy("turn_idx").collect()
    assert(out.map(_.getAs[Int]("turn_idx")).toSeq === Seq(1, 4))
    val first = out(0)
    assert(first.getAs[Long]("n_ctx") === 1L)
    assert(first.getAs[String]("context") === "user: hi")
    val second = out(1)
    assert(second.getAs[Long]("n_ctx") === 2L) // bounded at 2, not 4
    assert(second.getAs[String]("context") ===
      "user: do it\ntool: result 42")
  }

  test("partition invariance: 1 vs 13 partitions, identical results") {
    val t = synthTurnsMs(120)
    val injected = ConvOps.injectViolations(t)
    def run(df: DataFrame) = Seq(
      ConvOps.audit(spark, df),
      ConvOps.repair(spark, df),
      ConvOps.assemble(spark, t))
    val a = run(injected.coalesce(1))
    val b = run(injected.repartition(13))
    a.zip(b).foreach { case (x, y) =>
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)
    }
  }

  test("plan shapes: audit/assemble one Exchange, repair two") {
    // >64 convs so the generator emits multiple partitions — a
    // single-partition input satisfies any clustering and elides the
    // exchange, which would make this audit vacuous
    val t = synthTurnsMs(300)
    def nExchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    assert(nExchanges(ConvOps.audit(spark, t)) === 1)
    assert(nExchanges(ConvOps.assemble(spark, t)) === 1)
    assert(nExchanges(ConvOps.repair(spark, t)) <= 2)
  }

  /** Generator turns with ts already projected to epoch ms. */
  private def synthTurnsMs(nConvs: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.gen.TranscriptGen.dataset(spark, nConvs.toLong, megaTurns = 60)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
  }
}
