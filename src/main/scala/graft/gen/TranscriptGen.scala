package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn

/** Deterministic, seeded, DISTRIBUTED transcript synthesizer.
  *
  * Produces the north-rule input table (conv_id, turn_idx, role, text, tool,
  * ts) with every phenomenon the quality-filter + scrub pipeline must handle:
  * clean English, PII, placeholder profanity, non-English turns, gibberish,
  * page/OCR artifacts (the reference's home turf — src/CorpusAid.py:245-282),
  * HTML, too-short turns, intra-turn repetition, and verbatim cross-turn
  * repeats. One deliberate mega-conversation (conv 0) provides the skew case
  * (FIXTURES.md §1).
  *
  * Generation is keyed ONLY by (seed, convIdx, turnIdx) through splitmix64,
  * so the same parameters give byte-identical data at any parallelism or
  * partitioning — the property the scaling benchmark and resume tests rely
  * on. Turn counts are Zipf-like with median ≈5.
  */
object TranscriptGen {

  // -- deterministic PRNG ------------------------------------------------

  /** splitmix64 — public-domain mixing function. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final class Rng(seed: Long) extends Serializable {
    private var state = seed
    def nextLong(): Long = { state = mix64(state); state }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  // -- fragment pools ----------------------------------------------------

  private val cleanSentences: IndexedSeq[String] = IndexedSeq(
    "The quarterly report shows steady growth across all regions.",
    "Please review the attached proposal and share your feedback.",
    "Our team completed the migration ahead of schedule.",
    "The weather model predicts light rain over the coast tomorrow.",
    "She explained the algorithm with a clear worked example.",
    "Demand for renewable energy continues to rise worldwide.",
    "The committee approved the budget after a short discussion.",
    "He traveled through three countries to reach the conference.",
    "Machine learning systems require careful evaluation before deployment.",
    "The library extended its opening hours during exam season.",
    "A balanced diet and regular exercise improve long term health.",
    "The museum unveiled a new exhibition of early photography.",
    "Engineers tested the bridge design under simulated storm loads.",
    "The novel follows two families across four generations.",
    "Local farmers reported an unusually strong harvest this year.",
    "The spacecraft transmitted its first images after the flyby.",
    "Students presented their research at the annual symposium.",
    "The company announced a partnership with a regional university.",
    "Volunteers cleaned the riverbank and planted native trees.",
    "The orchestra performed the complete cycle in a single evening.",
    "New regulations require clearer labeling of imported goods.",
    "The documentary examines the history of transatlantic trade.",
    "Researchers observed the colony for three consecutive seasons.",
    "The city council debated the proposal late into the night.",
    "Analysts expect moderate inflation for the remainder of the year.",
    "The workshop covered practical techniques for data cleaning.",
    "Her latest paper introduces a simpler proof of the theorem.",
    "The festival attracts visitors from across the entire region.",
    "Developers shipped the security patch within twenty four hours.",
    "The recipe calls for fresh basil and a pinch of sea salt."
  )

  private val questions: IndexedSeq[String] = IndexedSeq(
    "Can you summarize the main findings for me?",
    "What are the trade offs between the two designs?",
    "How should we configure the cluster for this workload?",
    "Could you explain why the test failed on the second run?",
    "What is the recommended way to handle missing values here?",
    "Where does the pipeline spend most of its time?",
    "Is there a simpler approach that avoids the extra shuffle?",
    "How many partitions should we use at this scale?"
  )

  private val nonEnglish: IndexedSeq[String] = IndexedSeq(
    "Die Ergebnisse des Berichts zeigen ein stabiles Wachstum in allen Regionen.",
    "Der Ausschuss genehmigte den Haushalt nach kurzer Diskussion.",
    "Le rapport trimestriel montre une croissance stable dans toutes les régions.",
    "Veuillez examiner la proposition et partager vos commentaires.",
    "El informe trimestral muestra un crecimiento estable en todas las regiones.",
    "Los estudiantes presentaron su investigación en el simposio anual.",
    "Η τριμηνιαία έκθεση δείχνει σταθερή ανάπτυξη σε όλες τις περιοχές.",
    "Οι μαθητές παρουσίασαν την έρευνά τους στο ετήσιο συμπόσιο.",
    "Квартальный отчет показывает стабильный рост во всех регионах.",
    "Студенты представили свои исследования на ежегодном симпозиуме."
  )

  private val pii: IndexedSeq[String] = IndexedSeq(
    "You can reach me at john.doe@example.com for details.",
    "Contact support at help-desk@corp-mail.org right away.",
    "My number is 555-867-5309, call after five.",
    "Call the office at (212) 555-0187 before noon.",
    "The SSN on file is 078-05-1120 which looks wrong.",
    "Card ending 4111 1111 1111 1111 was declined yesterday.",
    "The server sits at 192.168.14.203 behind the proxy.",
    "See https://internal.example.com/ticket/8841 for the log trail.",
    "Her backup email is a.smith+test@dept.university.edu apparently."
  )

  /** Placeholder profanity lexicon (synthetic tokens, FIXTURES.md §3). */
  val toxLexicon: IndexedSeq[String] =
    IndexedSeq("frakking", "gorram", "smegging", "feldercarb", "dren", "frell")

  private val toxic: IndexedSeq[String] = IndexedSeq(
    "That frakking deploy broke everything again.",
    "What a gorram mess this migration turned out to be.",
    "The smegging test suite is flaky on Tuesdays.",
    "I am done with this feldercarb, rewrite it.",
    "This dren of a parser eats half the records.",
    "Stop the frell build before it ships."
  )

  private val artifacts: IndexedSeq[String] = IndexedSeq(
    "--- Page 17 ---\nThe chapter continues with the survey results.\n18",
    "  42  \nMeasurement continued as described above.\nxiv",
    "Page 3\nIntroduction to the method (Smith 2020) follows.",
    "a\nb\nThe scanned text resumes here after OCR noise.\n7",
    "IX\nAppendix tables follow on the next page.\npag. 12"
  )

  private val html: IndexedSeq[String] = IndexedSeq(
    "<p>The update is <b>ready</b> for review.</p>",
    "<div class=\"msg\">Deploy finished &amp; verified.</div>",
    "<ul><li>step one</li><li>step two</li></ul> done",
    "<a href=\"https://docs.example.org\">See the guide</a> for details."
  )

  private val tooShort: IndexedSeq[String] =
    IndexedSeq("ok", "k", "...", "yes", "+1", "??", "", " ")

  private val toolNames: IndexedSeq[String] =
    IndexedSeq("search", "calculator", "code_runner", "db_query", "browser")

  private def gibberish(rng: Rng): String = {
    val letters = "qxzjvkwpfy"
    val n = 30 + rng.nextInt(120)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (i % 7 == 6) sb.append(' ')
      else sb.append(letters.charAt(rng.nextInt(letters.length)))
      i += 1
    }
    sb.toString
  }

  private def repetitive(rng: Rng): String = {
    val phrase = rng.pick(IndexedSeq("buy now", "click here", "best price", "top deal"))
    (phrase + " ") * (20 + rng.nextInt(30))
  }

  private def longToken(rng: Rng): String =
    "See token " + ("x" * (60 + rng.nextInt(80))) + " embedded above."

  private def cleanTurn(rng: Rng, role: String): String = {
    val n = 1 + rng.nextInt(4)
    val pool = if (role == "user" && rng.nextDouble() < 0.4) questions else cleanSentences
    (0 until n).map(_ => rng.pick(pool)).mkString(" ")
  }

  /** The turn-text generator: category mix per FIXTURES.md §1. */
  def turnText(rng: Rng, role: String, prevText: String): String = {
    val r = rng.nextDouble()
    if (r < 0.66) cleanTurn(rng, role)
    else if (r < 0.71) rng.pick(pii)
    else if (r < 0.75) rng.pick(toxic)
    else if (r < 0.80) rng.pick(nonEnglish)
    else if (r < 0.84) gibberish(rng)
    else if (r < 0.87) rng.pick(artifacts)
    else if (r < 0.90) rng.pick(html)
    else if (r < 0.93) rng.pick(tooShort)
    else if (r < 0.95) repetitive(rng)
    else if (r < 0.97 && prevText.nonEmpty) prevText // verbatim cross-turn repeat
    else if (r < 0.98) longToken(rng)
    else cleanTurn(rng, role) + " " + rng.pick(pii)
  }

  /** Zipf-like turn count: median ~5, heavy tail capped at 60. */
  private def turnCount(rng: Rng): Int = {
    val u = rng.nextDouble()
    val v = math.min(60.0, 2.0 + 3.0 / math.max(0.02, u))
    v.toInt
  }

  private val baseEpochMs = 1700000000000L // fixed, deterministic

  /** Generate one conversation's turns sequentially (cross-turn repeats need
    * the previous text). */
  def conversation(seed: Long, convIdx: Long, megaTurns: Int): Seq[Turn] = {
    val rng = new Rng(mix64(seed ^ convIdx))
    val n = if (convIdx == 0L && megaTurns > 0) megaTurns else turnCount(rng)
    val convId = f"conv-$convIdx%08d"
    var prev = ""
    (0 until n).map { t =>
      val role = if (t % 2 == 0) "user" else "assistant"
      val isTool = role == "assistant" && rng.nextDouble() < 0.08
      val text = turnText(rng, role, prev)
      prev = text
      Turn(
        conv_id = convId,
        turn_idx = t,
        role = if (isTool) "tool" else role,
        text = text,
        tool = if (isTool) rng.pick(toolNames) else "",
        ts = new Timestamp(baseEpochMs + convIdx * 3600000L + t * 60000L)
      )
    }
  }

  /** Distributed dataset of `nConvs` conversations (conv 0 is the
    * mega-conversation when `megaTurns` > 0). */
  def dataset(
      spark: SparkSession,
      nConvs: Long,
      megaTurns: Int = 10000,
      seed: Long = 42L
  ): Dataset[Turn] = {
    import spark.implicits._
    spark
      .range(0, nConvs, 1, math.max(1, math.min(nConvs / 64 + 1, 512)).toInt)
      .as[Long]
      .mapPartitions(_.flatMap(ci => conversation(seed, ci, megaTurns)))
  }

  /** Local (driver-side) generation for tests and the sequential oracle. */
  def local(nConvs: Long, megaTurns: Int = 0, seed: Long = 42L): Seq[Turn] =
    (0L until nConvs).flatMap(ci => conversation(seed, ci, megaTurns))
}
