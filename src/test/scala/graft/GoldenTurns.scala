package graft

import graft.gen.TranscriptGen
import graft.run.QualityFilter

/** Writes the committed PER-TURN golden table for the q15/q30 oracles: the
  * sf0.01 synthetic transcript battery (the exact `SparkEntry.synthTurns`
  * shape — 1000 convs, 5000-turn mega, seed 42) through the SEQUENTIAL
  * spec evaluator ([[QualityFilter.sequentialFull]]), one parquet file with
  * every pipeline-visible field (role, lang, keep, clean/scrubbed text).
  * The DuckDB oracle reads this file, so the driver's correctness gate
  * compares the DISTRIBUTED pipeline's per-turn keep/drop decision and
  * scrubbed text — the north-rule contract — against the sequential spec.
  * Run once via `sbt "Test/runMain graft.GoldenTurns"`; regenerate ONLY on
  * an intentional spec change, with the commit message naming it. */
object GoldenTurns {
  // mirror of SparkEntry.synthTurns at sf0.01
  val NConvs = 1000L
  val Mega = 5000

  val path = "src/test/resources/golden/turns_sf001_golden.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val turns = TranscriptGen.local(NConvs, megaTurns = Mega)
    val evals = QualityFilter
      .sequentialFull(turns)
      .sortBy(e => (e.conv_id, e.turn_idx))
    // q30 cleans with the ALL-ON chain (every T-stage enabled), separate
    // from the pipeline's transcript-default chain — pin both
    val allOn = graft.pipeline.CleanPipeline
      .kernelChain(graft.model.CleanConfig.allOn)
    val allOnMap = turns.map(t => (t.conv_id, t.turn_idx) -> allOn(t.text)).toMap
    GoldenIo.writeSingleParquet(
      evals
        .map(e => (e.conv_id, e.turn_idx, e.role, e.lang, e.keep,
          e.clean_text, e.scrubbed_text, allOnMap((e.conv_id, e.turn_idx))))
        .toDF("conv_id", "turn_idx", "role", "lang", "keep",
          "clean_text", "scrubbed_text", "clean_text_allon"),
      path)
    println(s"wrote ${evals.size} golden turns to $path")
    spark.stop()
  }
}
