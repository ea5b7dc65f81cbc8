package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.transcript.{ConvGate, ConvOps, Pseudonymize, TurnDedup}

/** Transcript-payload operators beyond conversation structure: q90
  * cross-conversation turn dedup, q91 conversation-consistent PII
  * pseudonymization, q92 conversation-level quality gate. Oracles recompute
  * all three in DuckDB over the committed raw dump; this suite covers the
  * operator contracts and plan shapes.
  */
class TranscriptOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def turnsDF(
      rows: Seq[(String, Int, String, String, String, Long)]): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_ms")

  // ---- TurnDedup --------------------------------------------------------

  test("turn dedup r6: drops() == dedup().filter(!keep); tiers identical") {
    val t = synthTurnsMs(120)
    val scrub = t.select("conv_id", "turn_idx", "text")
    val fromDedup = TurnDedup.dedup(spark, scrub)
      .filter(!org.apache.spark.sql.functions.col("keep"))
      .select("conv_id", "turn_idx")
      .as[(String, Int)].collect().sorted
    val fromDrops = TurnDedup.drops(spark, scrub)
      .as[(String, Int)].collect().sorted
    assert(fromDrops === fromDedup)
    assert(fromDrops.nonEmpty, "the generator emits cross-turn repeats")
    // forced over-budget (shuffle) tier is count- and content-identical
    val shuffleTier = TurnDedup.drops(spark, scrub, dupHashBroadcastMax = 0L)
      .as[(String, Int)].collect().sorted
    assert(shuffleTier === fromDrops)
    val dedupShuffle = TurnDedup.dedup(spark, scrub, dupHashBroadcastMax = 0L)
      .orderBy("conv_id", "turn_idx").collect()
    val dedupBroadcast = TurnDedup.dedup(spark, scrub)
      .orderBy("conv_id", "turn_idx").collect()
    assert(dedupShuffle === dedupBroadcast)
  }

  test("turn dedup: first occurrence in (conv_id, turn_idx) order wins") {
    val rows = Seq(
      ("a1", 0, "user", "please review the attached proposal", "", 1000L),
      ("a1", 1, "assistant", "the migration finished ahead of time", "", 2000L),
      ("a2", 0, "user", "please review the attached proposal", "", 1000L),
      ("a2", 1, "assistant", "something else entirely happened here", "", 2000L),
      ("a0", 5, "user", "please review the attached proposal", "", 900L))
    val out = TurnDedup.dedup(spark, turnsDF(rows))
      .orderBy("conv_id", "turn_idx").collect()
    val byKey = out.map(r =>
      (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("n_occ"), r.getBoolean(r.fieldIndex("keep")))).toMap
    assert(byKey(("a0", 5)) === ((3L, true))) // "a0" < "a1": first occurrence
    assert(byKey(("a1", 0)) === ((3L, false)))
    assert(byKey(("a2", 0)) === ((3L, false)))
    assert(byKey(("a1", 1)) === ((1L, true)))
    assert(byKey(("a2", 1)) === ((1L, true)))
    val dup = out.find(r => r.getString(0) == "a1" && r.getInt(1) == 0).get
    assert(dup.getAs[String]("keeper_conv") === "a0")
    assert(dup.getAs[Int]("keeper_idx") === 5)
  }

  test("turn dedup: short turns are never candidates") {
    val rows = Seq(
      ("b1", 0, "user", "ok", "", 1000L),
      ("b2", 0, "user", "ok", "", 1000L),
      ("b3", 0, "user", "ok", "", 1000L))
    val out = TurnDedup.dedup(spark, turnsDF(rows)).collect()
    assert(out.forall(_.getBoolean(out.head.fieldIndex("keep"))))
    assert(out.forall(_.getAs[Long]("n_occ") === 1L))
  }

  test("turn dedup: generator corpus has template duplicates; rows preserved") {
    val t = synthTurnsMs(200)
    val out = TurnDedup.dedup(spark, t)
    assert(out.count() === t.count()) // one verdict row per turn
    val dups = out.where(!org.apache.spark.sql.functions.col("keep")).count()
    assert(dups > 0L, "template/verbatim repeats must be found")
    // every duplicate group keeps exactly one instance
    val grouped = out.where("n_occ > 1")
      .groupBy("keeper_conv", "keeper_idx")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("keep"), 1L).otherwise(0L))
        .as("kept"))
    assert(grouped.where("kept <> 1").count() === 0L)
  }

  // ---- Pseudonymize -----------------------------------------------------

  test("pseudonyms: conversation-stable aliases in first-appearance order") {
    val rows = Seq(
      ("c1", 0, "user", "mail a.smith@dept.edu and bob@corp.org today", "", 1000L),
      ("c1", 1, "assistant", "did a.smith@dept.edu reply yet?", "", 2000L),
      ("c2", 0, "user", "mail bob@corp.org now", "", 1000L))
    val out = Pseudonymize.entities(spark, turnsDF(rows)).collect()
    val k = out.map(r => (r.getString(0), r.getString(2)) ->
      (r.getAs[Int]("alias_idx"), r.getAs[String]("alias"),
        r.getAs[Long]("n_mentions"))).toMap
    assert(k(("c1", "a.smith@dept.edu")) === ((1, "[EMAIL_1]", 2L)))
    assert(k(("c1", "bob@corp.org")) === ((2, "[EMAIL_2]", 1L)))
    assert(k(("c2", "bob@corp.org")) === ((1, "[EMAIL_1]", 1L))) // per-conv
  }

  test("pseudonyms: chain semantics — an email inside a URL is consumed") {
    val rows = Seq(
      ("d1", 0, "user",
        "see https://x.example.com/u?e=a@b.com and mail c@d.org", "", 1000L))
    val out = Pseudonymize.entities(spark, turnsDF(rows)).collect()
    val byKind = out.groupBy(_.getString(1)).view.mapValues(
      _.map(_.getString(2)).toSet).toMap
    assert(byKind("url") === Set("https://x.example.com/u?e=a@b.com"))
    assert(byKind("email") === Set("c@d.org"))
  }

  test("pseudonyms: every scrub kind extracts and SSN beats phone shape") {
    val rows = Seq(
      ("e1", 0, "user",
        "ssn 078-05-1120 card 4111 1111 1111 1111 call (212) 555-0187 " +
          "ip 10.0.0.1 at https://h.example.org/x mail a@b.io", "", 1000L))
    val out = Pseudonymize.entities(spark, turnsDF(rows)).collect()
    assert(out.map(_.getString(1)).toSet ===
      Set("url", "email", "ssn", "credit_card", "phone", "ipv4"))
    // 078-05-1120 must be SSN (chain order), never a phone
    assert(out.filter(_.getString(1) == "phone")
      .map(_.getString(2)).toSet === Set("(212) 555-0187"))
  }

  test("pseudonyms: within-turn order breaks alias ties") {
    val rows = Seq(
      ("f1", 0, "user", "first z@z.org then a@a.org in one turn", "", 1000L))
    val out = Pseudonymize.entities(spark, turnsDF(rows)).collect()
    val k = out.map(r => r.getString(2) -> r.getAs[Int]("alias_idx")).toMap
    assert(k("z@z.org") === 1) // position order, not lexicographic
    assert(k("a@a.org") === 2)
  }

  test("rewrite: stable aliases land in the text, toxicity flat-masked") {
    val rows = Seq(
      ("r1", 0, "user", "mail a.smith@dept.edu and bob@corp.org", "", 1000L),
      ("r1", 1, "assistant",
        "that gorram a.smith@dept.edu bounced, see " +
          "https://x.example.com/u?e=a@b.com", "", 2000L),
      ("r2", 0, "user", "mail bob@corp.org", "", 1000L))
    val out = Pseudonymize.rewrite(spark, turnsDF(rows))
      .orderBy("conv_id", "turn_idx").collect()
    assert(out(0).getAs[String]("scrubbed") ===
      "mail [EMAIL_1] and [EMAIL_2]")
    assert(out(0).getAs[Int]("n_aliased") === 2)
    assert(out(1).getAs[String]("scrubbed") ===
      "that [REDACTED] [EMAIL_1] bounced, see [URL_1]")
    assert(out(1).getAs[Int]("n_aliased") === 2) // toxicity not counted
    assert(out(2).getAs[String]("scrubbed") === "mail [EMAIL_1]") // per-conv
  }

  test("rewrite: substitution total equals q91 mention total at scale") {
    val t = synthTurnsMs(200)
    val subs = Pseudonymize.rewrite(spark, t)
      .agg(org.apache.spark.sql.functions.sum("n_aliased")).collect()
      .head.getLong(0)
    val mentions = Pseudonymize.entities(spark, t)
      .agg(org.apache.spark.sql.functions.sum("n_mentions")).collect()
      .head.getLong(0)
    assert(subs === mentions && subs > 0L)
  }

  // ---- ConvGate ---------------------------------------------------------

  test("gate: streaks, gaps, tool share, verdict columns") {
    val rows = Seq(
      ("g1", 0, "user", "a", "", 1000L),
      ("g1", 1, "user", "b", "", 2000L),
      ("g1", 2, "user", "c", "", 1500L), // streak of 3 users; ts regress
      ("g1", 3, "tool", "r", "calc", 3000L),
      ("g1", 4, "tool", "r2", "search", 4000L),
      ("g1", 5, "assistant", "d", "", 5000L))
    val r = ConvGate.signals(spark, turnsDF(rows)).collect().head
    assert(r.getAs[Long]("n_turns") === 6L)
    assert(r.getAs[Long]("n_tool_calls") === 2L)
    assert(r.getAs[Long]("n_distinct_tools") === 2L)
    assert(r.getAs[String]("tools") === "calc,search")
    assert(r.getAs[Long]("n_gaps") === 5L)
    assert(r.getAs[Long]("gap_min") === -500L)
    assert(r.getAs[Long]("gap_max") === 1500L)
    assert(r.getAs[Long]("gap_sum") === 4000L)
    assert(r.getAs[Long]("max_role_streak") === 3L)
    assert(!r.getAs[Boolean]("time_ok"))
    assert(!r.getAs[Boolean]("tool_ok")) // 2*4 > 6
    assert(!r.getAs[Boolean]("streak_ok"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("gate: single-turn conversation has zero gap stats and keeps") {
    val r = ConvGate.signals(spark,
      turnsDF(Seq(("h1", 0, "user", "solo", "", 1000L)))).collect().head
    assert(r.getAs[Long]("n_gaps") === 0L)
    assert(r.getAs[Long]("gap_min") === 0L)
    assert(r.getAs[Long]("gap_sum") === 0L)
    assert(r.getAs[String]("tools") === "")
    assert(r.getAs[Boolean]("keep"))
  }

  test("gate over injections: every rule flips somewhere, keeps survive") {
    val g = ConvGate.signals(spark,
      ConvOps.injectViolations(synthTurnsMs(300)))
    val agg = g.selectExpr(
      "sum(case when time_ok then 0 else 1 end)",
      "sum(case when tool_ok then 0 else 1 end)",
      "sum(case when streak_ok then 0 else 1 end)",
      "sum(case when keep then 1 else 0 end)").collect().head
    (0 until 3).foreach(i => assert(agg.getLong(i) > 0L, s"rule $i never flipped"))
    assert(agg.getLong(3) > 0L, "no conversation kept")
  }

  // ---- SftPipeline capstone ----------------------------------------------

  test("capstone: scrub-first manifest — PII aliased, dups gone, gate applied") {
    val rows = Seq(
      // kept conversation: alternating roles, clean time, one email
      ("k1", 0, "user", "mail a.smith@dept.edu about the merge", "", 1000L),
      ("k1", 1, "assistant", "sent the note to a.smith@dept.edu", "", 2000L),
      ("k1", 2, "user", "the quarterly report is fine to share", "", 3000L),
      ("k1", 3, "assistant", "agreed, sharing the quarterly report", "", 4000L),
      // duplicated turn across convs: keeper is k1 (earlier conv id)
      ("z9", 0, "user", "the quarterly report is fine to share", "", 500L),
      ("z9", 1, "assistant", "understood and acknowledged fully", "", 1500L),
      // dropped conversation: user monologue (streak 3)
      ("m1", 0, "user", "first message of the monologue", "", 1000L),
      ("m1", 1, "user", "second message of the monologue", "", 2000L),
      ("m1", 2, "user", "third message of the monologue", "", 3000L),
      ("m1", 3, "assistant", "a reply that never makes it out", "", 4000L))
    val out = graft.transcript.SftPipeline.manifest(spark, turnsDF(rows))
      .orderBy("conv_id", "turn_idx").collect()
    // m1 gated out entirely; k1 keeps both assistant turns; z9 keeps its one
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("k1", 1), ("k1", 3), ("z9", 1)))
    val k1a = out(0)
    assert(k1a.getAs[String]("context") === "user: mail [EMAIL_1] about the merge")
    // k1's turn-2 text is a cross-conv duplicate with keeper k1 ("k1" < "z9"),
    // so it SURVIVES in k1 and the turn-3 context still shows it
    assert(out(1).getAs[String]("context").contains(
      "user: the quarterly report is fine to share"))
    assert(out(1).getAs[String]("context").contains("assistant: sent the note"))
    // z9 lost its duplicated turn 0, so its assistant turn has no context
    assert(out(2).getAs[Long]("n_ctx") === 0L)
    assert(out(2).getAs[String]("context") === "")
  }

  test("capstone at generator scale: no raw PII survives into any context") {
    val out = graft.transcript.SftPipeline.manifest(spark, synthTurnsMs(200))
    assert(out.count() > 0L)
    val leaky = out.where(
      org.apache.spark.sql.functions.col("context").rlike(
        """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\d{3}-\d{2}-\d{4}"""))
      .count()
    assert(leaky === 0L, "raw emails/SSNs must never reach a training example")
  }

  // ---- shared: partition invariance + plan shapes -----------------------

  test("partition invariance: 1 vs 13 partitions, identical results") {
    val t = synthTurnsMs(120)
    def run(df: DataFrame) = Seq(
      TurnDedup.dedup(spark, df),
      Pseudonymize.entities(spark, df),
      ConvGate.signals(spark, df))
    val a = run(t.coalesce(1))
    val b = run(t.repartition(13))
    a.zip(b).foreach { case (x, y) =>
      assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)
    }
  }

  test("plan shapes: gate one Exchange; dedup never shuffles unique strings") {
    val t = synthTurnsMs(300)
    def plan(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    def nExchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(plan(df)).length
    // every window/aggregation in the gate clusters on conv_id or a superset
    assert(nExchanges(ConvGate.signals(spark, t)) === 1)
    // pseudonym plan: one entity aggregation + one alias window
    assert(nExchanges(Pseudonymize.entities(spark, t)) <= 3)
    // dedup pass 1 aggregates 8-byte hashes: the hash aggregate's exchange
    // must carry xxhash64, not the text column
    val p = plan(TurnDedup.dedup(spark, t))
    assert(p.contains("xxhash64"))
  }

  /** Generator turns with ts projected to epoch ms (the q87-q92 shape). */
  private def synthTurnsMs(nConvs: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.gen.TranscriptGen.dataset(spark, nConvs.toLong, megaTurns = 60)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
  }
}
