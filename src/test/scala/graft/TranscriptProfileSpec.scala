package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.transcript.{BranchFamilies, RoleGrammar, ToolProfile}

/** Transcript profile operators q104-q106: per-tool latency/reliability,
  * role-transition grammar audit, branch-family (regeneration) detection.
  * The oracles recompute all three in DuckDB over the committed raw dump;
  * this suite covers the operator contracts (exact percentile ranks,
  * grammar legality, prefix-keyed family equivalence) on hand-built
  * fixtures plus injection coverage on the generator corpus.
  */
class TranscriptProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def turnsDF(
      rows: Seq[(String, Int, String, String, String, Long)]): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_ms")

  // ---- ToolProfile --------------------------------------------------------

  test("tool profile: exact discrete percentiles, errors, turn-0 exclusion") {
    val rows = Seq(
      // turn-0 tool call: no predecessor, no latency sample
      ("p0", 0, "tool", "orphan result", "search", 1000L),
      ("p1", 0, "user", "go", "", 1000L),
      ("p1", 1, "tool", "r1", "search", 1100L), // lat 100
      ("p1", 2, "user", "next", "", 1200L),
      ("p1", 3, "tool", "ERROR: boom", "search", 1400L), // lat 200
      ("p1", 4, "user", "next", "", 1500L),
      ("p1", 5, "tool", "r3", "search", 1800L), // lat 300
      ("p1", 6, "user", "next", "", 2000L),
      ("p1", 7, "tool", "r4", "search", 2400L), // lat 400
      ("p2", 0, "user", "calc", "", 1000L),
      ("p2", 1, "tool", "42", "calculator", 1050L)) // lat 50
    val out = ToolProfile.profile(spark, turnsDF(rows))
      .collect().map(r => r.getAs[String]("tool") -> r).toMap
    val s = out("search")
    assert(s.getAs[Long]("n_calls") === 4L)
    assert(s.getAs[Long]("n_convs") === 1L)
    assert(s.getAs[Long]("n_errors") === 1L)
    // ranks: k50 = (4+1) div 2 = 2 -> 200; k95 = (380+99) div 100 = 4 -> 400
    assert(s.getAs[Long]("p50_lat_ms") === 200L)
    assert(s.getAs[Long]("p95_lat_ms") === 400L)
    assert(s.getAs[Long]("max_lat_ms") === 400L)
    val c = out("calculator")
    assert(c.getAs[Long]("n_calls") === 1L)
    assert(c.getAs[Long]("p50_lat_ms") === 50L &&
      c.getAs[Long]("p95_lat_ms") === 50L)
  }

  test("tool profile: duplicate latency values collapse into histogram rows") {
    // five calls, latencies 10,10,10,20,20 -> p50 = rank 3 = 10,
    // p95 = rank (475+99) div 100 = 5 -> 20
    val rows = Seq(
      ("d1", 0, "user", "a", "", 0L),
      ("d1", 1, "tool", "x", "search", 10L),
      ("d1", 2, "user", "b", "", 20L),
      ("d1", 3, "tool", "x", "search", 30L),
      ("d1", 4, "user", "c", "", 40L),
      ("d1", 5, "tool", "x", "search", 50L),
      ("d1", 6, "user", "d", "", 60L),
      ("d1", 7, "tool", "x", "search", 80L),
      ("d1", 8, "user", "e", "", 90L),
      ("d1", 9, "tool", "x", "search", 110L))
    val out = ToolProfile.profile(spark, turnsDF(rows)).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("p50_lat_ms") === 10L)
    assert(out(0).getAs[Long]("p95_lat_ms") === 20L)
  }

  test("tool profile: injected generator corpus covers all tools + errors") {
    val out = ToolProfile.profile(spark,
      ToolProfile.inject(synthTurnsMs(400))).collect()
    assert(out.length === 5, "all five generator tools must appear")
    out.foreach { r =>
      assert(r.getAs[Long]("n_errors") > 0L,
        s"${r.getAs[String]("tool")}: error injection must land")
      assert(r.getAs[Long]("p50_lat_ms") >= 60000L,
        "jitter is additive over the 60 s base gap")
      assert(r.getAs[Long]("p95_lat_ms") >= r.getAs[Long]("p50_lat_ms"))
      assert(r.getAs[Long]("max_lat_ms") < 300000L,
        "jitter is bounded under 240 s")
    }
  }

  // ---- RoleGrammar --------------------------------------------------------

  test("role grammar: transition counts and legality verdicts") {
    val rows = Seq(
      ("g1", 0, "user", "q", "", 0L),
      ("g1", 1, "assistant", "a", "", 1L),
      ("g1", 2, "tool", "r", "search", 2L),
      ("g1", 3, "tool", "r", "search", 3L),
      ("g1", 4, "user", "q2", "", 4L),
      ("g2", 0, "assistant", "orphan", "", 0L),
      ("g2", 1, "assistant", "monologue", "", 1L))
    val out = RoleGrammar.matrix(spark, turnsDF(rows))
      .collect()
      .map(r => (r.getAs[String]("prev_role"), r.getAs[String]("role")) -> r)
      .toMap
    assert(out(("_start", "user")).getAs[Boolean]("legal"))
    assert(out(("user", "assistant")).getAs[Boolean]("legal"))
    assert(out(("assistant", "tool")).getAs[Boolean]("legal"))
    assert(out(("tool", "tool")).getAs[Boolean]("legal"))
    assert(!out(("tool", "user")).getAs[Boolean]("legal"))
    assert(!out(("_start", "assistant")).getAs[Boolean]("legal"))
    assert(!out(("assistant", "assistant")).getAs[Boolean]("legal"))
    assert(out(("_start", "user")).getAs[Long]("n_convs") === 1L)
    assert(out(("tool", "tool")).getAs[Long]("n_transitions") === 1L)
  }

  test("role grammar: every turn contributes exactly one transition") {
    val t = RoleGrammar.inject(synthTurnsMs(300))
    val out = RoleGrammar.matrix(spark, t)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_transitions"))
      .head.getLong(0) === t.count())
    // the injection creates the tool-chain transitions the generator never
    // emits naturally, and they are LEGAL; user->tool remains a violation
    val m = out.collect()
      .map(r => (r.getAs[String]("prev_role"), r.getAs[String]("role")) -> r)
      .toMap
    assert(m.contains(("tool", "tool")) &&
      m(("tool", "tool")).getAs[Boolean]("legal"))
    assert(m.contains(("assistant", "tool")) &&
      m(("assistant", "tool")).getAs[Boolean]("legal"))
    assert(m.contains(("user", "tool")) &&
      !m(("user", "tool")).getAs[Boolean]("legal"))
    // the matrix is bounded by the role vocabulary squared
    assert(out.count() <= 16L)
  }

  // ---- BranchFamilies -----------------------------------------------------

  test("branch families: shared prefix groups, divergence depth, length key") {
    val rows = Seq(
      // c1/c2: identical 3-turn prefix, diverge at turn 3
      ("c1", 0, "user", "A", "", 0L), ("c1", 1, "assistant", "B", "", 1L),
      ("c1", 2, "user", "C", "", 2L), ("c1", 3, "assistant", "D1", "", 3L),
      ("c1", 4, "user", "E1", "", 4L),
      ("c2", 0, "user", "A", "", 0L), ("c2", 1, "assistant", "B", "", 1L),
      ("c2", 2, "user", "C", "", 2L), ("c2", 3, "assistant", "D2", "", 3L),
      // c3/c4: verbatim re-ingest (identical entire trace)
      ("c3", 0, "user", "X", "", 0L), ("c3", 1, "assistant", "Y", "", 1L),
      ("c3", 2, "user", "Z", "", 2L), ("c3", 3, "assistant", "W", "", 3L),
      ("c4", 0, "user", "X", "", 0L), ("c4", 1, "assistant", "Y", "", 1L),
      ("c4", 2, "user", "Z", "", 2L), ("c4", 3, "assistant", "W", "", 3L),
      // c5/c6: 2-turn conversations sharing their whole (short) prefix
      ("c5", 0, "user", "A", "", 0L), ("c5", 1, "assistant", "B", "", 1L),
      ("c6", 0, "user", "A", "", 0L), ("c6", 1, "assistant", "B", "", 1L),
      // c7: 3 turns starting A,B — must NOT group with c5/c6 (pref_len key)
      ("c7", 0, "user", "A", "", 0L), ("c7", 1, "assistant", "B", "", 1L),
      ("c7", 2, "user", "Q", "", 2L))
    val out = BranchFamilies.families(spark, turnsDF(rows)).collect()
      .map(r => r.getAs[String]("family_id") -> r).toMap
    assert(out.size === 3)
    val f1 = out("c1")
    assert(f1.getAs[Long]("n_convs") === 2L)
    assert(f1.getAs[Long]("pref_len") === 3L)
    assert(f1.getAs[Long]("shared_depth") === 2L)
    assert(f1.getAs[String]("max_conv") === "c2")
    val f3 = out("c3")
    assert(f3.getAs[Long]("shared_depth") === 3L,
      "verbatim re-ingest shares its full depth")
    val f5 = out("c5")
    assert(f5.getAs[Long]("pref_len") === 2L)
    assert(f5.getAs[Long]("n_convs") === 2L,
      "c7 must not join the 2-turn family despite the matching 2-prefix")
    assert(f5.getAs[Long]("shared_depth") === 1L)
  }

  test("branch families r6: forced shuffle tier matches the broadcast tier") {
    val t = BranchFamilies.inject(synthTurnsMs(200))
    val bc = BranchFamilies.families(spark, t).collect()
    val sh = BranchFamilies.families(spark, t, broadcastMaxRows = 0L).collect()
    assert(sh === bc)
    assert(bc.nonEmpty)
  }

  test("branch families: injected template openers form 4-member families") {
    // 400 convs -> cv%10==7 gives 40 templated convs in 10 blocks of 4;
    // every generator conversation has >= 5 turns so pref_len is always 3
    val out = BranchFamilies.families(spark,
      BranchFamilies.inject(synthTurnsMs(400)))
    val quads = out.filter(col("n_convs") === 4L).collect()
    assert(quads.length === 10, "one 4-member family per 40-conv block")
    quads.foreach { r =>
      assert(r.getAs[Long]("pref_len") === 3L)
      assert(r.getAs[Long]("shared_depth") >= 2L,
        "the templated prefix is shared by construction")
    }
  }

  // ---- QuoteLeak ----------------------------------------------------------

  private def benchDF(items: (Long, String)*): DataFrame =
    items.toSeq.toDF("bench_id", "text")

  private def rndText(seed: Int, n: Int = 100): String = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(('a' + r.nextInt(26)).toChar).mkString
  }

  test("quote leak: per-item window counts; only quoted items found") {
    val x = rndText(7)
    val y = rndText(11)
    val bench = benchDF(10L -> x, 20L -> y)
    // one turn quotes chars 11..70 of x (the injection slice); y is never
    // quoted anywhere in the corpus
    val rows = Seq(
      ("c1", 0, "user", "please check this paragraph", "", 0L),
      ("c1", 1, "assistant",
        "it says: " + x.substring(10, 70) + " which is the eval item", "",
        1L),
      ("c2", 0, "user", "unrelated chatter entirely", "", 0L))
    val out = graft.transcript.QuoteLeak
      .report(spark, turnsDF(rows), bench)
      .collect().map(r => r.getAs[Long]("bench_id") -> r).toMap
    // 100-char item, k=30 -> 71 distinct windows; a 60-char quote covers
    // window starts 11..41 of the item = 31 found
    assert(out(10L).getAs[Long]("n_windows") === 71L)
    assert(out(10L).getAs[Long]("n_found") === 31L)
    assert(out(20L).getAs[Long]("n_windows") === 71L)
    assert(out(20L).getAs[Long]("n_found") === 0L)
  }

  test("quote leak: generators share no windows; injection plants them") {
    val bench = benchDF(
      (0L until 5L).map(i => (i * 10, rndText(100 + i.toInt))): _*)
    val natural = graft.transcript.QuoteLeak
      .report(spark, synthTurnsMs(100), bench)
    assert(natural.agg(org.apache.spark.sql.functions.sum("n_found"))
      .head.getLong(0) === 0L,
      "the transcript generator must share no 30-char window with bench")
    val injected = graft.transcript.QuoteLeak.report(spark,
      graft.transcript.QuoteLeak.inject(synthTurnsMs(100), bench), bench)
      .collect()
    assert(injected.forall(_.getAs[Long]("n_windows") === 71L))
    val found = injected.filter(_.getAs[Long]("n_found") > 0L)
    assert(found.nonEmpty, "the injection must leak at least one item")
    assert(found.forall(_.getAs[Long]("n_found") === 31L),
      "a quoted item leaks exactly its 31 spliced windows")
  }

  /** Generator turns with ts projected to epoch ms (the q87-q106 shape). */
  private def synthTurnsMs(nConvs: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.gen.TranscriptGen.dataset(spark, nConvs.toLong, megaTurns = 60)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
  }
}
