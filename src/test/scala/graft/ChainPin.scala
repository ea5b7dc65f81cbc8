package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.CleanConfig
import graft.pipeline.CleanPipeline

/** Pins the all-stages-on chain spec (including T12 tokenizer / T13 stop
  * words / T14 HTML strip, which have no Python-derivable golden — SURVEY.md
  * §7.4 items 3-4) against a committed output file. Regenerate ONLY on an
  * intentional spec change: `sbt "Test/runMain graft.ChainPin"`. */
object ChainPin {
  val path = Paths.get("src/test/resources/golden/chain_allon_pin.tsv")

  def inputs: Seq[String] = {
    val rng = new graft.gen.TranscriptGen.Rng(31L)
    val atoms = IndexedSeq("word", "Foo", "42", "don't", "<b>x</b>", "&amp;",
      "αβ", "Ж", "²", "ﬁ", " ", "\n", ". ", "(Smith 2020)", "Page 3",
      "--- Page 9 ---", "the", "AND", "e.g.", "ß", "İ", "Σ", " the cat ")
    (0 until 80).map { _ =>
      (0 until rng.nextInt(18)).map(_ => rng.pick(atoms)).mkString
    }
  }

  def compute(): Seq[String] = {
    val chain = CleanPipeline.kernelChain(CleanConfig.allOn)
    inputs.map(chain)
  }

  private def esc(s: String) =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")

  def main(args: Array[String]): Unit = {
    val lines = inputs.zip(compute()).map { case (i, o) => s"${esc(i)}\t${esc(o)}" }
    Files.write(path, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} chain pins to $path")
  }
}

class ChainPinSpec extends AnyFunSuite {
  test("all-on chain output matches the committed pin file") {
    val url = getClass.getResource("/golden/chain_allon_pin.tsv")
    assert(url != null, "run `sbt \"Test/runMain graft.ChainPin\"` once and commit")
    val src = scala.io.Source.fromURL(url, "UTF-8")
    val expected = try src.getLines().map(_.split("\t", 2)(1)).toVector finally src.close()
    def unesc(s: String) =
      s.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
    val actual = ChainPin.compute().toVector
    assert(actual.size === expected.size)
    actual.zip(expected.map(unesc)).zipWithIndex.foreach { case ((a, e), i) =>
      assert(a === e, s"chain spec drift at pin $i (input: ${ChainPin.inputs(i)})")
    }
  }
}
