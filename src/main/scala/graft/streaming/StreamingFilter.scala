package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{CleanConfig, Turn}
import graft.pipeline.CleanPipeline
import graft.quality.{FilterConfig, Heuristics, LangId, Perplexity}
import graft.scrub.Scrubber

/** Structured Streaming variant of the quality filter.
  *
  * The reference is strictly batch (one run per button press,
  * src/CorpusAid.py:2420-2445); this is the engine extension for continuous
  * transcript ingestion. Per-turn stages are the same pure kernels; the
  * cross-turn repetition rule becomes keyed state: conv_id →
  * last-K clean texts, via flatMapGroupsWithState (SURVEY.md §2.4 row
  * "streaming").
  *
  * Assumes per-conversation monotone arrival (standard when the upstream
  * bus partitions by conv_id); late turns are evaluated against state as-of
  * arrival.
  */
object StreamingFilter {

  final case class StreamedVerdict(
      conv_id: String,
      turn_idx: Int,
      role: String,
      lang: String,
      ppl: Double,
      keep: Boolean,
      drop_reasons: Seq[String],
      scrubbed_text: String
  )

  final case class ConvState(lastTexts: List[String])

  def apply(
      turns: Dataset[Turn],
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig(),
      stateRetentionMs: Long = 7L * 24 * 3600 * 1000
  ): Dataset[StreamedVerdict] = {
    import turns.sparkSession.implicits._
    val chainCfg = cleanCfg.validated
    val fcfg = filterCfg

    def process(
        convId: String,
        it: Iterator[Turn],
        state: GroupState[ConvState]
    ): Iterator[StreamedVerdict] = {
      val chain = CleanPipeline.kernelChain(chainCfg)
      var prevs = state.getOption.map(_.lastTexts).getOrElse(Nil)
      // NOTE (memory bound): the sort buffers ONE conversation's turns from
      // ONE micro-batch — bounded by the trigger interval / maxOffsetsPerTrigger,
      // not by total conversation length (cross-batch order is carried by the
      // lastTexts state, which is capped at crossTurnWindow entries). A
      // mega-conversation therefore costs O(turns-per-batch) heap here; size
      // triggers accordingly rather than raising executor memory.
      // idle-conversation expiry: a state-store entry per conv_id forever
      // is the unbounded-state failure mode on a continuous stream.
      // EVENT-time timeout, not processing-time: processing-time timeouts
      // make every micro-batch schedule the next one, so
      // processAllAvailable (and any drain-the-source consumer) never
      // settles; event-time timeouts advance only with the watermark and
      // are reprocessing-safe.
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val out = it.toSeq.sortBy(_.turn_idx).map { t =>
        // null text gets the batch path's null_text verdict instead of an
        // NPE that would kill the whole streaming query (QualityFilter
        // guards identically)
        if (t.text == null)
          StreamedVerdict(t.conv_id, t.turn_idx, t.role, "und", 0.0,
            keep = false, Seq("null_text"), null)
        else {
          val cleanText = chain(t.text)
          val (lang, _) = LangId.model.classify(cleanText)
          val ppl = Perplexity.model.perplexity(cleanText)
          val fails = Heuristics.ruleFailures(cleanText, t.role, lang, ppl, fcfg)
          val crossRep = prevs.contains(cleanText)
          prevs = (cleanText :: prevs).take(fcfg.crossTurnWindow)
          val reasons = if (crossRep) fails :+ "cross_turn_repeat" else fails
          StreamedVerdict(t.conv_id, t.turn_idx, t.role, lang, ppl,
            reasons.isEmpty, reasons, Scrubber.scrub(cleanText))
        }
      }
      state.update(ConvState(prevs))
      // expire the conversation once the watermark passes its last
      // activity + retention; batch mode has no watermark — the guard
      // keeps the batch-equivalence tests on the same code path
      try state.setTimeoutTimestamp(
        state.getCurrentWatermarkMs() + stateRetentionMs)
      catch { case _: UnsupportedOperationException | _: IllegalStateException => }
      out.iterator
    }

    // The watermark on ts drives state expiry (streaming only; a no-op on
    // batch Datasets). Retention is ALSO the lateness horizon: turns more
    // than stateRetentionMs behind the max seen ts are dropped by the
    // watermark as late — size it to dominate the source's disorder (the
    // default is 7 days; conversation state older than that expires).
    turns
      .withWatermark("ts", s"${stateRetentionMs / 1000} seconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }
}
