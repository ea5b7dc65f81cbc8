package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.transcript.{CodeBlocks, ConvNearDup, TurnTiming}

/** Transcript mining operators q101-q103: timestamp-integrity signals,
  * fenced-code-block mining, conversation-grain near-duplicate pairs. The
  * oracles recompute all three in DuckDB over the committed raw dump; this
  * suite covers the operator contracts, injection coverage, and the plan
  * shapes.
  */
class TranscriptMiningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def turnsDF(
      rows: Seq[(String, Int, String, String, String, Long)]): DataFrame =
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_ms")

  // ---- TurnTiming ---------------------------------------------------------

  test("timing: ooo, long gap, span, single-turn conversation") {
    val g = TurnTiming.LongGapMs
    val rows = Seq(
      // c1: regular minute pacing, then one backward clock at t2
      ("c1", 0, "user", "a", "", 60000L),
      ("c1", 1, "assistant", "b", "", 120000L),
      ("c1", 2, "user", "c", "", 100000L), // -20 s: out of order
      ("c1", 3, "assistant", "d", "", 180000L),
      // c2: one stitch gap
      ("c2", 0, "user", "a", "", 0L),
      ("c2", 1, "assistant", "b", "", g + 60001L),
      // c3: single turn
      ("c3", 0, "user", "a", "", 5000L))
    val out = TurnTiming.signals(spark, turnsDF(rows))
      .collect().map(r => r.getAs[String]("conv_id") -> r).toMap
    val c1 = out("c1")
    assert(c1.getAs[Long]("n_ooo") === 1L)
    assert(c1.getAs[Long]("n_long_gap") === 0L)
    assert(c1.getAs[Long]("span_ms") === 120000L)
    assert(c1.getAs[Long]("max_gap_ms") === 80000L) // 100000 -> 180000
    assert(!c1.getAs[Boolean]("keep"))
    val c2 = out("c2")
    assert(c2.getAs[Long]("n_ooo") === 0L)
    assert(c2.getAs[Long]("n_long_gap") === 1L)
    assert(c2.getAs[Long]("max_gap_ms") === g + 60001L)
    assert(!c2.getAs[Boolean]("keep"))
    val c3 = out("c3")
    assert(c3.getAs[Long]("n_turns") === 1L)
    assert(c3.getAs[Long]("span_ms") === 0L)
    assert(c3.getAs[Long]("max_gap_ms") === 0L)
    assert(c3.getAs[Boolean]("keep"))
  }

  test("timing: generator clock is clean; injection plants both defects") {
    val t = synthTurnsMs(300)
    val clean = TurnTiming.signals(spark, t)
    assert(clean.where("n_ooo > 0 OR n_long_gap > 0").count() === 0L,
      "the raw generator clock must be regular (the fixture rule premise)")
    val inj = TurnTiming.signals(spark, TurnTiming.inject(t))
    assert(inj.where("n_ooo > 0").count() > 0L, "ooo branch unexercised")
    assert(inj.where("n_long_gap > 0").count() > 0L,
      "long-gap branch unexercised")
    // the suffix shift injects exactly one long gap, nothing out of order
    assert(inj.where("n_long_gap > 0 AND n_ooo = 0 AND n_long_gap = 1")
      .count() > 0L)
    assert(inj.count() === clean.count())
  }

  // ---- CodeBlocks ---------------------------------------------------------

  test("code blocks: multi-block turn, language tags, body chars") {
    val text = "Try this:\n```python\nx = 1\n```\nthen\n" +
      "```\nSELECT 1;\n```\nand\n```scala\nval y = 2\n```"
    val rows = Seq(
      ("c1", 0, "assistant", text, "", 0L),
      ("c1", 1, "user", "no code here, just ``inline`` ticks", "", 1L),
      ("c2", 0, "user", "plain", "", 0L))
    val out = CodeBlocks.signals(spark, turnsDF(rows))
      .collect().map(r => r.getAs[String]("conv_id") -> r).toMap
    val c1 = out("c1")
    assert(c1.getAs[Long]("n_blocks") === 3L)
    assert(c1.getAs[Long]("n_python") === 1L)
    assert(c1.getAs[Long]("n_scala") === 1L)
    assert(c1.getAs[Long]("n_anon") === 1L)
    assert(c1.getAs[Long]("code_chars") ===
      ("x = 1\n".length + "SELECT 1;\n".length + "val y = 2\n".length).toLong)
    assert(c1.getAs[Boolean]("has_code"))
    val c2 = out("c2")
    assert(c2.getAs[Long]("n_blocks") === 0L && !c2.getAs[Boolean]("has_code"))
  }

  test("code blocks: unterminated fence matches nothing") {
    val rows = Seq(("c1", 0, "assistant", "```python\nx = 1", "", 0L))
    val out = CodeBlocks.signals(spark, turnsDF(rows)).collect()(0)
    assert(out.getAs[Long]("n_blocks") === 0L)
  }

  test("code blocks: generator emits no backticks; injection covers tags") {
    val t = synthTurnsMs(300)
    val clean = CodeBlocks.signals(spark, t)
    assert(clean.where("n_blocks > 0").count() === 0L,
      "generator corpus must be fence-free (the fixture rule premise)")
    val inj = CodeBlocks.signals(spark, CodeBlocks.inject(t))
    assert(inj.where("n_python > 0").count() > 0L)
    assert(inj.where("n_scala > 0").count() > 0L)
    assert(inj.where("n_anon > 0").count() > 0L)
    assert(inj.where("code_chars > 0").count() > 0L)
  }

  // ---- ConvNearDup --------------------------------------------------------

  test("near-dup: jaccard over ordered shingles; order sensitivity") {
    def conv(id: String, texts: Seq[String]) =
      texts.zipWithIndex.map { case (x, i) => (id, i, "user", x, "", 0L) }
    val a = Seq("t0", "t1", "t2", "t3", "t4") // 3 shingles
    val b = Seq("t0", "t1", "t2", "t3", "zz") // shares shingle (t0,t1,t2), (t1,t2,t3)
    val c = Seq("t4", "t3", "t2", "t1", "t0") // same texts, reversed: no match
    val rows = conv("a", a) ++ conv("b", b) ++ conv("c", c)
    val out = ConvNearDup.pairs(spark, turnsDF(rows),
      ConvNearDup.Config(k = 3, tau = 0.4))
      .collect().map(r =>
        (r.getAs[String]("conv_a"), r.getAs[String]("conv_b")) -> r).toMap
    assert(out.size === 1)
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_common") === 2L)
    assert(ab.getAs[Long]("n_a") === 3L && ab.getAs[Long]("n_b") === 3L)
    assert(math.abs(ab.getAs[Double]("jaccard") - 0.5) < 1e-15)
  }

  test("near-dup: set semantics (repeated windows collapse)") {
    val texts = Seq("x", "x", "x", "x", "x") // all shingles identical
    val rows = texts.zipWithIndex.map { case (t, i) =>
      ("a", i, "user", t, "", 0L)
    } ++ texts.zipWithIndex.map { case (t, i) => ("b", i, "user", t, "", 0L) }
    val out = ConvNearDup.pairs(spark, turnsDF(rows)).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_a") === 1L)
    assert(out(0).getAs[Double]("jaccard") === 1.0)
  }

  test("near-dup: stop-shingle cap prunes ubiquitous shingles") {
    // 5 conversations all sharing the same single shingle: with
    // maxBucket >= 5 that is 10 exact-dup pairs, with maxBucket 4 none
    val rows = (0 until 5).flatMap(c =>
      Seq(0, 1, 2).map(i => (s"c$c", i, "user", s"t$i", "", 0L)))
    val withCap = ConvNearDup.pairs(spark, turnsDF(rows),
      ConvNearDup.Config(maxBucket = 4))
    assert(withCap.count() === 0L)
    val noCap = ConvNearDup.pairs(spark, turnsDF(rows),
      ConvNearDup.Config(maxBucket = 5))
    assert(noCap.count() === 10L)
  }

  test("near-dup: injected copies pair with their originals above tau") {
    val t = synthTurnsMs(200)
    val out = ConvNearDup.pairs(spark, ConvNearDup.inject(t)).cache()
    try {
      val dupPairs = out
        .where("conv_b = conv_a || '-dup'")
      val n = dupPairs.count()
      assert(n > 0L, "no original/copy pair surfaced")
      // every surfaced original/copy pair meets tau; the edit stride keeps
      // long conversations BELOW jaccard 1 and misses short ones entirely
      assert(dupPairs.where("jaccard < 1.0").count() > 0L,
        "edit stride never landed — all pairs exact")
      assert(dupPairs.where("jaccard = 1.0").count() > 0L,
        "short-conversation exact-copy branch unexercised")
      // conversations with < k turns are structurally absent
      val shortConvs = t.groupBy("conv_id").count().where("count < 3")
        .select(col("conv_id")).as[String].collect().toSet
      val inPairs = out.select("conv_a").as[String].collect().toSet ++
        out.select("conv_b").as[String].collect().toSet
      assert(shortConvs.intersect(inPairs).isEmpty)
    } finally { out.unpersist(); () }
  }

  // ---- plan shapes --------------------------------------------------------

  test("plan: timing and code-block rollups cost one exchange") {
    // 300 convs → a multi-partition source (at 1 partition Spark elides
    // the aggregation exchange entirely — SinglePartition satisfies any
    // ClusteredDistribution — and the assert would pass vacuously)
    val t = synthTurnsMs(300)
    def nExchanges(df: DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(nExchanges(TurnTiming.signals(spark, TurnTiming.inject(t))) === 1)
    assert(nExchanges(CodeBlocks.signals(spark, CodeBlocks.inject(t))) === 1)
  }

  /** Generator turns with ts projected to epoch ms (the q87-q103 shape). */
  private def synthTurnsMs(nConvs: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.gen.TranscriptGen.dataset(spark, nConvs.toLong, megaTurns = 60)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
  }
}
