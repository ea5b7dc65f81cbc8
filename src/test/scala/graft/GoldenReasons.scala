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
    val hist = QualityFilter
      .sequentialReasons(turns)
      .flatMap(_._3)
      .groupBy(identity)
      .map { case (r, rs) => (r, rs.size.toLong) }
      .toSeq
      .sortBy(_._1)
    val out = "reason\tcount\n" +
      hist.map { case (r, n) => s"$r\t$n" }.mkString("\n")
    Files.write(path, out.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${hist.size} reason rows to $path")
    hist.foreach { case (r, n) => println(f"  $r%-24s $n") }
  }
}
