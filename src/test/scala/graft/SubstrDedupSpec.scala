package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.SubstrDedup

class SubstrDedupSpec extends AnyFunSuite with SparkTestBase {

  // boilerplate-heavy synthetic corpus: a shared header (> k, repeated in
  // every doc), a shared footer, a within-doc repeated phrase, plus unique
  // bodies; k small so spans and seams are exercised densely
  private val cfg = SubstrDedup.Config(k = 8, minCount = 4)
  private def mkDocs: Seq[(Long, String)] = {
    val header = "COMMON-HEADER-LINE:"
    val footer = ":COMMON-FOOTER"
    val r = new graft.gen.TranscriptGen.Rng(5150L)
    (0L until 40L).map { i =>
      val body = (0 until 12).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val withinDoc =
        if (i % 5 == 0) "repeatme-repeatme-repeatme-repeatme" else body.reverse
      (i, s"$header$body$withinDoc$footer")
    } ++ Seq(
      (100L, null: String), // null text passes through
      (101L, "short"), // shorter than k passes through
      (102L, "COMMON-HEADER-LINE:COMMON-HEADER-LINE:") // back-to-back repeats
    )
  }

  test("distributed dedup == first-principles brute force (no hashes)") {
    import spark.implicits._
    val docs = mkDocs
    val got = SubstrDedup
      .dedup(spark, docs.toDF("id", "text"), "id", "text", cfg)
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    val want = SubstrDedup.bruteForce(docs, cfg).sortBy(_._1)
    assert(got === want)
    // the corpus genuinely exercises the operator: headers/footers cut
    val cut = got.filter(_._3 > 0)
    assert(cut.size > 30, s"only ${cut.size} docs had spans cut")
    assert(got.find(_._1 == 100L).get._2 == null)
    assert(got.find(_._1 == 101L).get === ((101L, "short", 0, 0)))
  }

  test("over-budget tier (distributed confirm set) == in-budget tier == brute force") {
    import spark.implicits._
    val docs = mkDocs
    // maxConfirmedChars=1 forces the distributed semi-join tier: the
    // confirmed set never touches the driver, yet every mark must agree
    val forced = cfg.copy(maxConfirmedChars = 1L)
    val obs = org.apache.spark.sql.Observation()
    val got = SubstrDedup
      .dedup(spark, docs.toDF("id", "text"), "id", "text", forced, Some(obs))
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    val want = SubstrDedup.bruteForce(docs, cfg).sortBy(_._1)
    assert(got === want)
    // the observe side channel carries the stage totals on the pin job
    assert(obs.get("n_substr").asInstanceOf[Long] ===
      want.map(_._3.toLong).sum)
    assert(obs.get("chars_removed").asInstanceOf[Long] ===
      want.map(_._4.toLong).sum)
  }

  test("span merge semantics: overlap and touch merge, seams are not re-scanned") {
    val k = 4
    // windows "aaaa" at 0..2 overlap -> ONE span [0,6); the remaining text
    // must survive verbatim
    val t = "aaaaaaXYZ"
    val marked = Array(true, true, true, false, false, false)
    val cut = SubstrDedup.cutSpans(t, marked, k)
    assert(cut === SubstrDedup.Cut("XYZ", 1, 6))
    // touching spans ([0,4) and [4,8)) merge into one
    val cut2 = SubstrDedup.cutSpans("abcdefgh", Array(true, false, false, false, true), k)
    assert(cut2 === SubstrDedup.Cut("", 1, 8))
    // disjoint spans stay separate
    val t3 = "aaaa--------bbbb"
    val m3 = new Array[Boolean](t3.length - k + 1)
    m3(0) = true; m3(12) = true
    assert(SubstrDedup.cutSpans(t3, m3, k) === SubstrDedup.Cut("--------", 2, 8))
    // span at the very end
    val m4 = new Array[Boolean](t3.length - k + 1)
    m4(t3.length - k) = true
    assert(SubstrDedup.cutSpans(t3, m4, k) === SubstrDedup.Cut("aaaa--------", 1, 4))
  }

  test("exchanges carry hashes and candidate substrings, never documents") {
    import spark.implicits._
    // fat unique bodies + a small boilerplate tail: the corpus text bytes
    // dwarf what the two aggregation passes are allowed to exchange
    val pad = "x"
    val r = new graft.gen.TranscriptGen.Rng(6060L)
    val docs = (0L until 400L).map { i =>
      val unique = (0 until 600).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      (i, s"BOILERPLATE-PREFIX-$pad:$unique")
    }.toDF("id", "text").localCheckpoint(true)
    val textBytes = 400L * 620
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try {
        val o = SubstrDedup
          .dedup(spark, docs, "id", "text", SubstrDedup.Config(k = 10, minCount = 5))
          .collect()
        // listener events are async: poll until the metric stabilizes
        // instead of hoping one fixed sleep outlasts a loaded host
        var last = -1L
        var spins = 0
        while (shuffleWrite.get() != last && spins < 20) {
          last = shuffleWrite.get()
          Thread.sleep(250)
          spins += 1
        }
        o
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(out.length === 400)
    // pass 1 exchanges one (hash, count) pair per distinct window — a
    // FIXED 16B/window regardless of document width (all-unique bodies =
    // the worst case, ~16x the text bytes at 1 window/char); pass 2
    // exchanges only the boilerplate-prefix candidates. The bound catches
    // the failure modes that matter: document rows riding an exchange or
    // a per-pair/cartesian blowup (both are orders of magnitude above it)
    assert(shuffleWrite.get() < textBytes * 24,
      s"substr dedup shuffled ${shuffleWrite.get()} bytes vs $textBytes corpus bytes")
    // and every doc lost exactly its boilerplate prefix
    assert(out.forall(_.getInt(2) >= 1))
  }
}
