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

  /** Row budget for broadcasting the small side of the attach joins (the
    * duplicate-drop list and the kept-conversation list): ~40-byte rows →
    * ≤ ~80 MB relation. Above it the joins fall back to shuffles (both are
    * fixed-key equi-joins — scale-safe without the hints). */
  val AttachBroadcastMaxRows: Long = 2L << 20

  def manifest(
      spark: SparkSession,
      turns: DataFrame,
      ctxTurns: Int = 6
  ): DataFrame = {
    import graft.run.Materialize

    // 1. scrub first: aliased rewrite with the trace columns riding the
    // rewrite's own conv_id join (r6: the former re-attach join of the
    // rewrite output back to `turns` on (conv_id, turn_idx) shuffled both
    // 557k-row sides for columns the rewrite could simply pass through).
    // PINNED (Materialize.pin): the regex-chain rewrite is the capstone's
    // dominant per-row cost and feeds every downstream stage — without the
    // pin each branch would re-run the whole chain (the q59 lesson).
    // The pin is repartitioned on conv_id and sorted on the window keys
    // BEFORE materializing. localCheckpoint does NOT preserve
    // outputPartitioning metadata (the pinned scan reports
    // UnknownPartitioning, so downstream windows still plan an exchange) —
    // but the PHYSICAL layout still pays off measurably: the conversation
    // clustering + (conv_id, turn_idx, ts_ms) order make the downstream
    // exchanges/sorts cheap (nearly-sorted runs), measured ~0.9 s faster
    // at sf0.1 than pinning the raw join output.
    val nPart = math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism)
    val scrubbed = Materialize.pin(
      Pseudonymize.rewrite(spark, turns,
          passThrough = Seq("role", "tool", "ts_ms"))
        .repartition(nPart, col("conv_id"))
        .sortWithinPartitions("conv_id", "turn_idx", "ts_ms"))

    // 2. cross-conversation turn dedup on the scrubbed text — drop-list
    // form: the dedup decision is attached by SUBTRACTING the (small)
    // duplicate mass instead of semi-joining the (corpus-sized) keep set,
    // so the scrubbed table is never re-shuffled (guide §8: decide on
    // small rows, never move the payload again). Broadcast under a row
    // budget; above it the anti-join shuffles (fixed-width keys).
    val drops = Materialize.pin(TurnDedup.drops(spark,
      scrubbed.select(col("conv_id"), col("turn_idx"),
        col("scrubbed").as("text"))))
    val dropsSide =
      if (drops.count() <= AttachBroadcastMaxRows) broadcast(drops) else drops
    val survivors = scrubbed
      .join(dropsSide, Seq("conv_id", "turn_idx"), "left_anti")

    // 3. conversation gate over the surviving trace; pinned so the gate
    // verdict is computed exactly once (leaving it lazy duplicates the
    // whole survivors subtree inside the final plan — measured 1.7 s
    // slower at sf0.1 than the pin + probed broadcast)
    val kept = Materialize.pin(ConvGate.signals(spark, survivors)
      .where(col("keep")).select("conv_id"))
    val keptSide =
      if (kept.count() <= AttachBroadcastMaxRows) broadcast(kept) else kept

    // 4. bounded context assembly from scrubbed text, kept convs only
    ConvOps.assemble(spark,
      survivors
        .join(keptSide, Seq("conv_id"), "left_semi")
        .select(col("conv_id"), col("turn_idx"), col("role"),
          col("scrubbed").as("text"), col("tool"), col("ts_ms")),
      ctxTurns)
  }
}
