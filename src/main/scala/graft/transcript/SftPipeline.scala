package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript capstone — the end-to-end SFT-example manifest, composing the
  * whole q87-q93 family in the privacy-correct order (scrub FIRST, so no
  * later stage ever sees raw PII):
  *
  *   1. [[Pseudonymize.rewrite]] — conversation-consistent aliased scrub of
  *      every turn (byte-exact, goldened independently);
  *   2. [[TurnDedup]] on the SCRUBBED text — templated replies dedup even
  *      better once identities are normalized away; dropped turns vanish
  *      from the trace (first-occurrence keep, cross-conversation);
  *   3. [[ConvGate]] over the surviving trace — time sanity, tool share,
  *      role streaks on what remains (gaps are re-derived over surviving
  *      adjacency, exactly what a packer would see);
  *   4. [[ConvOps.assemble]] for assistant turns of kept conversations —
  *      the bounded previous-K context rendered from scrubbed text.
  *
  * Output: one SFT example per surviving assistant turn of a kept
  * conversation — (conv_id, turn_idx, n_ctx, context). Every stage is a
  * conv_id-clustered window/aggregate, so the composition inherits the
  * flagship partitioning; the only corpus-scale string shuffle is the
  * dedup's duplicate mass (two-pass hash prefilter).
  *
  * Oracle posture (q94): stage 1 replays the committed q93 golden; stages
  * 2-4 are recomputed by DuckDB's own window engine over that golden
  * joined to the raw dump — the capstone needs no new golden (the q83
  * lesson: composition queries are oracled by composing stage oracles).
  */
object SftPipeline {

  def manifest(
      spark: SparkSession,
      turns: DataFrame,
      ctxTurns: Int = 6
  ): DataFrame = {
    // 1. scrub first: aliased rewrite, then re-attach the trace columns.
    // PINNED (Materialize.pin): the regex-chain rewrite is the capstone's
    // dominant per-row cost and feeds THREE downstream consumers (the
    // dedup's two passes + the survivor semi-join) — without the pin each
    // branch would re-run the whole chain (the q59 lesson).
    val scrubbed = graft.run.Materialize.pin(
      Pseudonymize.rewrite(spark, turns)
        .join(turns.select("conv_id", "turn_idx", "role", "tool", "ts_ms"),
          Seq("conv_id", "turn_idx")))

    // 2. cross-conversation turn dedup on the scrubbed text
    val verdict = TurnDedup.dedup(spark,
      scrubbed.select(col("conv_id"), col("turn_idx"),
        col("scrubbed").as("text")))
    val survivors = scrubbed
      .join(verdict.where(col("keep")).select("conv_id", "turn_idx"),
        Seq("conv_id", "turn_idx"), "left_semi")

    // 3. conversation gate over the surviving trace
    val kept = ConvGate.signals(spark, survivors)
      .where(col("keep")).select("conv_id")

    // 4. bounded context assembly from scrubbed text, kept convs only
    ConvOps.assemble(spark,
      survivors
        .join(kept, Seq("conv_id"), "left_semi")
        .select(col("conv_id"), col("turn_idx"), col("role"),
          col("scrubbed").as("text"), col("tool"), col("ts_ms")),
      ctxTurns)
  }
}
