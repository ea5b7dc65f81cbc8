package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.quality.{LangId, Perplexity}
import graft.run.QualityFilter
import graft.scrub.Scrubber

/** End-to-end: the distributed pipeline must reproduce the sequential
  * single-threaded spec evaluation exactly (keep/drop F1 and byte-exact
  * scrubbed text — BASELINE.md targets), on seeded synthetic transcripts
  * including the mega-conversation skew case. */
class QualityFilterSpec extends AnyFunSuite with SparkTestBase {

  test("langid: discriminates the six seed languages on held-out sentences") {
    val samples = Seq(
      "en" -> "The committee will publish the final report next week after review.",
      "en" -> "Developers shipped the security patch within twenty four hours.",
      "de" -> "Die Regierung hat heute ein neues Gesetz über den Datenschutz beschlossen.",
      "fr" -> "Le gouvernement a annoncé une nouvelle loi sur la protection des données.",
      "es" -> "El gobierno anunció una nueva ley sobre la protección de datos personales.",
      "el" -> "Η κυβέρνηση ανακοίνωσε σήμερα έναν νέο νόμο για την προστασία δεδομένων.",
      "ru" -> "Правительство объявило сегодня новый закон о защите персональных данных."
    )
    samples.foreach { case (expected, text) =>
      val (lang, margin) = LangId.model.classify(text)
      assert(lang === expected, s"text=$text margin=$margin")
      assert(margin > 0.0)
    }

    // a single-language model must classify, not throw on the missing
    // runner-up slot
    val solo = LangId.train(Seq("en" -> graft.quality.SeedCorpora.english))
    val (l, _) = solo.classify("hello world, how are you")
    assert(l === "en")
  }

  test("perplexity: clean English scores far below gibberish and non-English") {
    val m = Perplexity.model
    val clean = Seq(
      "The quarterly report shows steady growth across all regions.",
      "Please review the attached proposal and share your feedback.",
      "Volunteers cleaned the riverbank and planted native trees."
    ).map(m.perplexity(_))
    val junk = Seq(
      "qxzjvk wpfyqx zjvkwp fyqxzj vkwpfy qxzjvk",
      "zzzzqq xxkkjj vvwwpp ffyyqq zzxxkk jjvvww"
    ).map(m.perplexity(_))
    val nonEn = Seq(
      "Квартальный отчет показывает стабильный рост во всех регионах."
    ).map(m.perplexity(_))
    assert(clean.max < 20.0, s"clean ppl too high: $clean")
    assert(junk.min > 50.0, s"gibberish ppl too low: $junk")
    assert(nonEn.min > 25.0, s"non-english ppl too low: $nonEn")
  }

  test("scrubber: masks every PII family and toxicity, byte-deterministically") {
    val s = "Mail a.b+c@x-y.co.uk or visit https://a.b/c?d=e; SSN 123-45-6789, " +
      "card 4111 1111 1111 1111, call (212) 555-0187 or 555-867-5309, " +
      "host 10.0.0.1, that frakking GORRAM thing"
    val out = Scrubber.scrub(s)
    assert(out === "Mail [EMAIL] or visit [URL] SSN [SSN], " +
      "card [CC], call [PHONE] or [PHONE], " +
      "host [IP], that [REDACTED] [REDACTED] thing")
    assert(Scrubber.scrub(out) === out) // idempotent on masked output
  }

  test("distributed pipeline == sequential oracle (F1 = 1.0, byte-exact scrub)") {
    import spark.implicits._
    val nConvs = 400L
    val mega = 800 // skew: conv 0 has 800 turns vs median ~5
    val turns = TranscriptGen.dataset(spark, nConvs, megaTurns = mega)
    val out = QualityFilter(spark, turns)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
      .as[(String, Int, Boolean, String)]
      .collect()
      .map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap

    val oracle = QualityFilter
      .sequentialOracle(TranscriptGen.local(nConvs, megaTurns = mega))
      .map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap

    assert(out.keySet === oracle.keySet)

    var tp = 0; var fp = 0; var fn = 0; var scrubMismatch = 0
    oracle.foreach { case (k, (keepO, scrubO)) =>
      val (keepD, scrubD) = out(k)
      if (keepD && keepO) tp += 1
      else if (keepD && !keepO) fp += 1
      else if (!keepD && keepO) fn += 1
      if (scrubD != scrubO) scrubMismatch += 1
    }
    val precision = tp.toDouble / math.max(1, tp + fp)
    val recall = tp.toDouble / math.max(1, tp + fn)
    val f1 = 2 * precision * recall / math.max(1e-9, precision + recall)
    info(f"keep/drop F1 = $f1%.4f (tp=$tp fp=$fp fn=$fn), scrub mismatches = $scrubMismatch / ${oracle.size}")
    assert(f1 >= 0.99, s"F1 $f1 below target")
    assert(scrubMismatch === 0, "scrubbed text must be byte-exact")

    // the synthetic mix must exercise both labels materially
    val kept = oracle.values.count(_._1)
    assert(kept > oracle.size / 4 && kept < oracle.size * 9 / 10,
      s"degenerate label distribution: $kept / ${oracle.size}")
  }

  test("native TurnAnalysis == broadcast-UDF analysis path") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 150L, megaTurns = 100)
    def collectOut(native: Boolean) =
      QualityFilter(spark, turns, useNativeAnalysis = native)
        .select("conv_id", "turn_idx", "lang", "ppl", "keep", "drop_reasons")
        .as[(String, Int, String, Double, Boolean, Seq[String])]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(collectOut(true) === collectOut(false))
  }

  test("observe metrics reach the MetricsListener (progress signals)") {
    val listener = graft.run.MetricsListener.install(spark)
    try {
      val turns = TranscriptGen.dataset(spark, 80L, megaTurns = 0)
      val n = turns.count()
      QualityFilter(spark, turns).write.format("noop").mode("overwrite").save()
      // listener callbacks are async — poll for delivery
      val deadline = System.nanoTime() + 15000000000L
      while (listener.snapshots.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      val snaps = listener.snapshots
      assert(snaps.nonEmpty, "no observed metrics delivered")
      val m = snaps.last
      assert(m.turns === n)
      assert(m.kept > 0 && m.kept < m.turns)
      assert(m.bytesIn > 0 && m.turnsPerSec > 0)
    } finally spark.listenerManager.unregister(listener)
  }

  test("drop reasons are populated and observable") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 120L, megaTurns = 0)
    val reasons = QualityFilter(spark, turns)
      .select(explode(col("drop_reasons")).as("r"))
      .groupBy("r").count().as[(String, Long)].collect().toMap
    // every major rule family fires on the synthetic mix
    Seq("too_short", "lang_not_allowed", "high_perplexity", "repetitive",
      "cross_turn_repeat", "long_token").foreach { r =>
      assert(reasons.getOrElse(r, 0L) > 0L, s"rule $r never fired: $reasons")
    }
  }
}
