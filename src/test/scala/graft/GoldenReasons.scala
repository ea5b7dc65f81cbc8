package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.gen.TranscriptGen
import graft.run.QualityFilter

/** Writes the committed q33 drop-reason golden HISTOGRAM: the sf0.01
  * synthetic transcript battery (the exact `SparkEntry.synthTurns` shape —
  * 1000 convs, 5000-turn mega, seed 42) through the SEQUENTIAL spec
  * evaluator ([[QualityFilter.sequentialReasons]]). Run once via
  * `sbt "Test/runMain graft.GoldenReasons"`; the output is committed so the
  * q33 DuckDB oracle compares the distributed pipeline's reason histogram
  * against the sequential spec, the same pin-the-spec contract as
  * [[GoldenLabels]]. Regenerate ONLY on an intentional filter-spec change,
  * with the commit message naming the semantic change. */
object GoldenReasons {
  // mirror of SparkEntry.synthTurns at sf0.01
  val NConvs = 1000L
  val Mega = 5000

  def path = Paths.get("src/test/resources/golden/drop_reasons_sf001.tsv")

  def main(args: Array[String]): Unit = {
    val turns = TranscriptGen.local(NConvs, megaTurns = Mega)
    val reasons = QualityFilter.sequentialReasons(turns).map(_._3)
    val hist = reasons.flatten
      .groupBy(identity).map { case (r, rs) => (r, rs.size.toLong) }
    // ablation column: turns dropped SOLELY by this rule — the marginal
    // cost a filter-tuning loop reads (relaxing the rule recovers exactly
    // these turns)
    val sole = reasons.filter(_.size == 1).map(_.head)
      .groupBy(identity).map { case (r, rs) => (r, rs.size.toLong) }
    val rows = hist.keySet.toSeq.sorted
      .map(r => (r, hist(r), sole.getOrElse(r, 0L)))
    val out = "reason\tcount\tsole_count\n" +
      rows.map { case (r, n, s) => s"$r\t$n\t$s" }.mkString("\n")
    Files.write(path, out.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${rows.size} reason rows to $path")
    rows.foreach { case (r, n, s) => println(f"  $r%-24s $n%6d sole=$s%6d") }
  }
}
