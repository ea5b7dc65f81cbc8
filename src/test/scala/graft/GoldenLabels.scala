package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.gen.TranscriptGen
import graft.run.QualityFilter

/** Writes the committed golden keep/scrub label table (FIXTURES.md §4):
  * seed-7 synthetic conversations through the SEQUENTIAL spec evaluator.
  * Run once via `sbt "Test/runMain graft.GoldenLabels"`; the output is
  * committed so GoldenLabelsSpec pins the SPEC itself — if a later change
  * shifts semantics, the pinned file fails even though pipeline and oracle
  * moved together. */
object GoldenLabels {
  val Seed = 7L
  val NConvs = 120L
  val Mega = 150

  def compute(): Seq[(String, Int, Boolean, String)] =
    QualityFilter
      .sequentialOracle(TranscriptGen.local(NConvs, megaTurns = Mega, seed = Seed))
      .sortBy(r => (r._1, r._2))

  def path = Paths.get("src/test/resources/golden/labels_seed7.tsv")

  def main(args: Array[String]): Unit = {
    val rows = compute().map { case (c, t, k, s) =>
      s"$c\t$t\t$k\t${s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")}"
    }
    Files.write(path, rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${rows.size} golden labels to $path")
  }
}
