package graft.run

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CleanText
import graft.model.{CleanConfig, Turn}
import graft.quality.{FilterConfig, Heuristics, LangId, Perplexity}
import graft.scrub.Scrubber

/** The flagship job (north_rule): language-ID + quality-filter + PII/toxicity
  * scrub over the transcripts table, emitting keep/drop + byte-exact scrubbed
  * text per turn.
  *
  * Plan shape (one shuffle total):
  *   scan → [CleanText native expr] → [one fused analysis UDF: langid + KN
  *   perplexity + heuristic rules, single text pass each, broadcast models]
  *   → window over (conv_id ORDER BY turn_idx) for the cross-turn repetition
  *   rule (THE shuffle — by conv_id) → keep/drop + [ScrubText native expr].
  *
  * Scale notes: the per-turn stages are embarrassingly parallel and stay in
  * WholeStageCodegen; the window frame is bounded (lag ≤ K), so cost is
  * linear even for mega-conversations; both models are driver-built once and
  * broadcast (LangId ~1.5 MB, Perplexity ~300 KB) — nothing is re-trained or
  * re-shipped per task.
  */
object QualityFilter {

  /** Analysis payload produced by the single fused per-turn UDF. */
  final case class Analysis(
      lang: String,
      lang_score: Double,
      ppl: Double,
      fails: Seq[String]
  )

  /** Error-tolerant analysis payload: `error` is null on success. */
  final case class SafeAnalysis(
      clean_text: String,
      a: Analysis,
      error: String
  )

  def apply(
      spark: SparkSession,
      turns: Dataset[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig(),
      inputBucketed: Boolean = false,
      useNativeAnalysis: Boolean = true,
      errorTolerant: Boolean = false
  ): DataFrame = {
    val fcfg = filterCfg

    // Two equivalent analysis stages (cross-checked in QualityFilterSpec):
    //  - native TurnAnalysis expression: models resolve via deterministic
    //    JVM singletons (built from embedded constants — zero shipping
    //    cost, ~8% faster than the UDF: no encoder round-trip)
    //  - broadcast + UDF: the pattern to flip to when the models are
    //    DATA-trained artifacts that must ship from the driver
    def analyzeCol: org.apache.spark.sql.Column =
      if (useNativeAnalysis)
        graft.functions.TurnAnalysis(col("clean_text"), col("role"), fcfg)
      else {
        val sc = spark.sparkContext
        val lidB = sc.broadcast(LangId.model)
        val pplB = sc.broadcast(Perplexity.model)
        val analyze = udf { (text: String, role: String) =>
          if (text == null) Analysis("und", 0.0, 0.0, Seq("null_text"))
          else {
            val (lang, score) = lidB.value.classify(text)
            val ppl = pplB.value.perplexity(text)
            Analysis(lang, score, ppl,
              Heuristics.ruleFailures(text, role, lang, ppl, fcfg))
          }
        }
        analyze(col("clean_text"), col("role"))
      }

    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    // window = 0 disables the rule (the oracle and streaming paths treat
    // it that way; an empty reduce would throw at plan build)
    val crossRepeat =
      if (filterCfg.crossTurnWindow <= 0) lit(false)
      else (1 to filterCfg.crossTurnWindow)
        .map(k => coalesce(col("clean_text") === lag(col("clean_text"), k).over(w), lit(false)))
        .reduce(_ || _)

    // Shuffle FIRST, on the raw (narrow) rows: repartition+sortWithinPartitions
    // already satisfies the window's required distribution and ordering, so
    // the Window adds NO second exchange — and the clean/analyze/scrub work
    // all runs post-shuffle in one stage, keeping clean_text and the analysis
    // struct out of the shuffle entirely (~2x less shuffle volume).
    //
    // The partition count is EXPLICIT: AQE would coalesce this exchange by
    // shuffle BYTES, but the downstream cost here is CPU per row (regex +
    // models), so byte-based coalescing serializes the whole pipeline onto a
    // handful of cores. Explicit N opts this exchange out of AQE coalescing.
    // When the input table is already conv_id-bucketed + sorted
    // (TranscriptTable), the scan itself satisfies the window: ZERO shuffles.
    val nPart = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val parted =
      if (inputBucketed) turns.toDF()
      else turns
        .repartition(nPart, col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("turn_idx"))
    // Error-tolerant mode (the reference's per-row error side-channel,
    // src/CorpusAid.py:2483-2500, generalized from Media.decode's
    // valid=false shape): every per-turn stage runs inside one total UDF;
    // a row whose stage throws — pathological user regex blowing the
    // matcher stack, a future codec error — lands with an `error` string
    // and keep=false instead of failing the job. The native-codegen path
    // stays the default; this is the opt-in never-throw hardening.
    val analyzed =
      if (!errorTolerant)
        parted
          .withColumn("clean_text", CleanText(col("text"), cleanCfg))
          .withColumn("a", analyzeCol)
      else {
        val chain = graft.pipeline.CleanPipeline.kernelChain(cleanCfg)
        val safe = udf { (text: String, role: String) =>
          try {
            if (text == null)
              SafeAnalysis(null, Analysis("und", 0.0, 0.0, Seq("null_text")), null)
            else {
              val ct = chain(text)
              val (lang, score) = LangId.model.classify(ct)
              val ppl = Perplexity.model.perplexity(ct)
              SafeAnalysis(ct,
                Analysis(lang, score, ppl,
                  Heuristics.ruleFailures(ct, role, lang, ppl, fcfg)), null)
            }
          } catch {
            case e: StackOverflowError =>
              SafeAnalysis(null, Analysis("und", 0.0, 0.0, Seq("error")),
                "StackOverflowError: pathological regex/input")
            case scala.util.control.NonFatal(e) =>
              SafeAnalysis(null, Analysis("und", 0.0, 0.0, Seq("error")),
                (e.getClass.getName + ": " + e.getMessage).take(200))
          }
        }
        parted
          .withColumn("s", safe(col("text"), col("role")))
          .withColumn("clean_text", col("s.clean_text"))
          .withColumn("a", col("s.a"))
          .withColumn("error", col("s.error"))
          .drop("s")
      }

    analyzed
      .withColumn("cross_repeat", crossRepeat)
      .withColumn(
        "drop_reasons",
        when(col("cross_repeat"),
          concat(col("a.fails"), array(lit("cross_turn_repeat"))))
          .otherwise(col("a.fails"))
      )
      .withColumn("keep", size(col("drop_reasons")) === 0)
      .withColumn("scrubbed_text", Scrubber(col("clean_text")))
      // live run counters (reference progress/report signals,
      // src/CorpusAid.py:762-793 → Dataset.observe + QueryExecutionListener)
      .observe("graft_metrics",
        count(lit(1)).as("turns"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(octet_length(col("text"))).as("bytes_in"))
      .select(
        (Seq(
          col("conv_id"), col("turn_idx"), col("role"), col("text"),
          col("clean_text"), col("scrubbed_text"),
          col("a.lang").as("lang"), col("a.lang_score").as("lang_score"),
          col("a.ppl").as("ppl"), col("keep"), col("drop_reasons")
        ) ++ (if (errorTolerant) Seq(col("error")) else Nil)): _*
      )
  }

  /** Never-throw run with a quarantine side-channel: rows whose per-turn
    * stages threw land in the second DataFrame as (conv_id, turn_idx, role,
    * text, error) — the job keeps going (reference error-collection
    * semantics, src/CorpusAid.py:2483-2500). Both frames derive from ONE
    * pipeline; production callers should persist the tolerant result (or
    * write both sinks from one pass) rather than recompute per branch. */
  def quarantineSplit(
      spark: SparkSession,
      turns: Dataset[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): (DataFrame, DataFrame) = {
    val tolerant = apply(spark, turns, cleanCfg, filterCfg, errorTolerant = true)
    val clean = tolerant.filter(col("error").isNull).drop("error")
    val quarantined = tolerant.filter(col("error").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("error"))
    (clean, quarantined)
  }

  /** Typed boundary (input_hint mandates typed Dataset at the API surface). */
  def typed(
      spark: SparkSession,
      turns: Dataset[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): Dataset[graft.model.CleanedTurn] = {
    import spark.implicits._
    apply(spark, turns, cleanCfg, filterCfg).as[graft.model.CleanedTurn]
  }

  /** One sequentially-evaluated turn: every field the distributed pipeline
    * emits, produced by the plain single-threaded spec loop. */
  final case class SeqEval(
      conv_id: String,
      turn_idx: Int,
      role: String,
      clean_text: String,
      lang: String,
      keep: Boolean,
      drop_reasons: List[String],
      scrubbed_text: String
  )

  /** The full sequential spec evaluator — the independent (non-Spark)
    * reference the golden pins and F1 tests compare the distributed
    * pipeline against. One loop per conversation in turn order, exactly
    * like the reference's sequential file pass. */
  def sequentialFull(
      turns: Seq[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): Seq[SeqEval] = {
    val chain = graft.pipeline.CleanPipeline.kernelChain(cleanCfg)
    turns
      .groupBy(_.conv_id)
      .toSeq
      .flatMap { case (convId, ts) =>
        val sorted = ts.sortBy(_.turn_idx)
        var prevs = List.empty[String]
        sorted.map { t =>
          val cleanText = chain(t.text)
          val (lang, _) = LangId.model.classify(cleanText)
          val ppl = Perplexity.model.perplexity(cleanText)
          val fails =
            Heuristics.ruleFailures(cleanText, t.role, lang, ppl, filterCfg)
          val crossRep = prevs.contains(cleanText)
          prevs = (cleanText :: prevs).take(filterCfg.crossTurnWindow)
          val reasons =
            if (crossRep) fails :+ "cross_turn_repeat" else fails
          SeqEval(convId, t.turn_idx, t.role, cleanText, lang,
            reasons.isEmpty, reasons, Scrubber.scrub(cleanText))
        }
      }
  }

  /** Sequential single-threaded evaluation of the SAME spec — the oracle the
    * distributed pipeline is checked against (keep/drop F1 and byte-exact
    * scrubbed text, BASELINE.md targets). Uses the same pure kernels but an
    * explicit prev-K buffer instead of a Window, so it exercises none of
    * Spark's distribution machinery. */
  def sequentialOracle(
      turns: Seq[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): Seq[(String, Int, Boolean, String)] =
    sequentialFull(turns, cleanCfg, filterCfg)
      .map(e => (e.conv_id, e.turn_idx, e.keep, e.scrubbed_text))

  /** Reason lists only (the committed q33 histogram pin — `GoldenReasons`
    * aggregates THIS evaluator's output, never the distributed pipeline's). */
  def sequentialReasons(
      turns: Seq[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): Seq[(String, Int, List[String])] =
    sequentialFull(turns, cleanCfg, filterCfg)
      .map(e => (e.conv_id, e.turn_idx, e.drop_reasons))
}
