package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Decontaminate, DupGroups, NgramJaccard}
import graft.gen.TranscriptGen
import graft.operators.Pack
import graft.run.QualityFilter
import graft.sample.{Interleave, Mixture}

/** Capstone: the full training-data pipeline composed from the library's
  * operators — quality filter → exact dedup → near-dup GROUP dedup →
  * benchmark decontamination → mixture weights → weighted interleave →
  * sequence packing — with the cross-stage invariants a production run
  * relies on, plus end-to-end determinism (two runs, identical bytes).
  */
class PipelineE2ESpec extends AnyFunSuite with SparkTestBase {

  /** One full pipeline pass; returns (final table, benchmark doc ids). */
  private def runPipeline(): (DataFrame, Set[Long]) = {
    import spark.implicits._

    // 0: raw multi-turn transcripts (includes a mega-conversation)
    val turns = TranscriptGen.dataset(spark, 150, megaTurns = 60)

    // 1: language-ID + quality filter + scrub; keep only passing turns
    val kept = QualityFilter(spark, turns)
      .filter(col("keep"))
      .select(
        xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
        col("scrubbed_text").as("text"))
      .filter(length(col("text")) > 20)

    // 2: exact dedup — first occurrence (min doc_id) per distinct text
    val exact = kept
      .groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .drop("h")

    // 3: near-dup pair graph → connected groups → one representative
    val pairs = NgramJaccard
      .similarPairs(spark, exact.select(col("doc_id").as("id"), col("text")),
        n = 2, tau = 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val reps = DupGroups
      .components(spark, pairs, exact.select(col("doc_id").as("id")))
      .filter(col("keep"))
      .select(col("id").as("rep_id"))
    val deduped = exact.join(reps,
      exact("doc_id") === reps("rep_id"), "left_semi")

    // 4: decontamination — "benchmark" = 5 deterministic docs of the
    // surviving corpus itself (guaranteed overlap), removed by anti-join
    val bench = deduped.filter(pmod(col("doc_id"), lit(41)) === 0)
    val benchIds = bench.select("doc_id").as[Long].collect().toSet
    val dirty = Decontaminate
      .contaminated(spark, deduped, bench, "doc_id", "text", n = 3)
      .select(col("doc_id").as("dirty_id"))
    val clean = deduped.join(dirty,
      col("doc_id") === col("dirty_id"), "left_anti")

    // 5: mixture weights over a derived source + weighted interleave
    val sourced = clean.withColumn(
      "source", concat(lit("s"), pmod(col("doc_id"), lit(4))))
    val weights = Mixture.weights(
      sourced, col("source"), length(col("text")), alpha = 0.7)
    val interleaved = Interleave.byWeight(
      spark, sourced, col("source"), col("doc_id"), weights,
      numPartitions = 4)

    // 6: pack the interleaved stream into fixed-token context windows
    val withTokens = interleaved.withColumn(
      "n_tokens", size(split(trim(col("text")), "\\s+")))
    val packed = Pack.contiguous(
      withTokens, Seq("source"), "interleave_rank", "n_tokens",
      budget = 256)
    (packed, benchIds)
  }

  test("filter → dedup → decontaminate → mix → interleave → pack invariants") {
    import spark.implicits._
    val (packed, benchIds) = runPipeline()
    val rows = packed
      .select("doc_id", "source", "interleave_rank", "n_tokens", "bin")
      .as[(Long, String, Long, Int, Long)].collect()
    assert(rows.nonEmpty)

    // near-dup invariant: the surviving corpus has NO pair at the dedup
    // threshold — group resolution removed transitive duplicates
    val survivors = packed.select(col("doc_id").as("id"), col("text"))
    val residual = NgramJaccard.similarPairs(spark, survivors, n = 2, tau = 0.5)
    assert(residual.isEmpty, "no near-dup pair may survive group dedup")

    // decontamination invariant: benchmark member docs are gone
    assert(rows.map(_._1).toSet.intersect(benchIds).isEmpty,
      "contaminated docs must not survive")

    // interleave invariant: ranks are dense 1..n
    assert(rows.map(_._3).sorted.toSeq === (1L to rows.length))

    // packing invariant: every bin except a group's last fills past the
    // point where the next doc would overflow; no bin exceeds
    // budget + its own largest doc (contiguous-policy bound), and token
    // mass is conserved
    val budget = 256L
    rows.groupBy(r => (r._2, r._5)).foreach { case ((srcBin), rs) =>
      val tot = rs.map(_._4.toLong).sum
      val maxDoc = rs.map(_._4.toLong).max
      assert(tot <= budget + maxDoc,
        s"bin $srcBin holds $tot tokens vs budget $budget (+$maxDoc)")
    }
    val totalTokens = rows.map(_._4.toLong).sum
    assert(totalTokens === packed.agg(sum("n_tokens")).head().getLong(0))
  }

  test("pipeline is deterministic end-to-end: two runs, identical output") {
    import spark.implicits._
    def snapshot(): Seq[(Long, String, Long, Long)] =
      runPipeline()._1
        .select("doc_id", "source", "interleave_rank", "bin")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(snapshot() === snapshot())
  }
}
