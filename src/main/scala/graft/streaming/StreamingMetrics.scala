package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{CleanConfig, Turn}
import graft.pipeline.CleanPipeline
import graft.quality.{FilterConfig, Heuristics, LangId, Perplexity}

/** Watermarked tumbling-window ingest metrics — the continuous analog of
  * the reference's run report (files/sec, processed counts) and of the
  * engine's batch `observe` counters: per event-time window, how many turns
  * arrived and how many the per-turn rules keep, split by language.
  *
  * Scope note: the verdict here is the STATELESS per-turn portion of the
  * pipeline (clean → langid → perplexity → rules); the cross-turn
  * repetition refinement needs keyed conversation state and is owned by
  * [[StreamingFilter]] / the batch lineage — ingest metrics deliberately
  * avoid doubling that state.
  *
  * Append output mode + watermark means a window's row is emitted exactly
  * once, when the watermark passes its end — the metrics table is
  * append-only and idempotent to re-read (a dashboard or alerting job tails
  * it without dedup logic). State per window is a handful of counters,
  * expired by the watermark — bounded regardless of stream length. Partial
  * aggregation runs per partition before the stateful shuffle, so the
  * exchange carries (window, lang, partial counts) rows only — never text.
  */
object StreamingMetrics {

  /** Per-(window, lang) turn + keep counts for a streaming Dataset[Turn].
    *
    * @param lateness watermark delay (how long to wait for stragglers)
    * @param window   tumbling window width
    */
  def apply(
      turns: Dataset[Turn],
      lateness: String = "10 minutes",
      window: String = "5 minutes",
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): DataFrame = {
    val chain = CleanPipeline.columnChain(cleanCfg)
    val langUdf = udf((clean: String) =>
      if (clean == null) "und" else LangId.model.classify(clean)._1)
    val fcfg = filterCfg
    val keepUdf = udf((clean: String, role: String, lang: String) =>
      clean != null && Heuristics.ruleFailures(
        clean, role, lang, Perplexity.model.perplexity(clean), fcfg).isEmpty)

    turns.toDF()
      .withColumn("clean_text", chain(col("text")))
      .withColumn("lang", langUdf(col("clean_text")))
      .withColumn("keep",
        keepUdf(col("clean_text"), col("role"), col("lang")))
      .withWatermark("ts", lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window),
        col("lang"))
      .agg(
        count(lit(1)).as("n_turns"),
        count(when(col("keep"), 1)).as("n_keep"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("n_turns"), col("n_keep"))
  }
}
