package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine SPEC against the committed golden label table
  * (generated once by GoldenLabels, reviewed, committed). A semantics change
  * anywhere in clean/langid/perplexity/rules/scrub breaks this even when the
  * distributed pipeline and the in-process oracle drift together. */
class GoldenLabelsSpec extends AnyFunSuite {

  test("sequential spec evaluation matches the committed golden labels") {
    val url = getClass.getResource("/golden/labels_seed7.tsv")
    assert(url != null, "run `sbt \"Test/runMain graft.GoldenLabels\"` once and commit the output")
    val src = Source.fromURL(url, "UTF-8")
    val expected = try {
      src.getLines().map { line =>
        val Array(c, t, k, s) = line.split("\t", 4)
        (c, t.toInt, k.toBoolean,
          s.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\"))
      }.toVector
    } finally src.close()

    val actual = GoldenLabels.compute().toVector
    assert(actual.size === expected.size)
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      assert(a === e, s"golden label drift at row $i")
    }
  }
}
