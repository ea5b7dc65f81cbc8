package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextCorpus

class SourcesSpec extends AnyFunSuite with SparkTestBase {

  test("recursive .txt scan: case-insensitive extension, one row per file, dedup") {
    val dir = Files.createTempDirectory("graft_corpus_")
    Files.createDirectories(Paths.get(dir.toString, "sub/deep"))
    Files.writeString(Paths.get(dir.toString, "a.txt"), "alpha doc")
    Files.writeString(Paths.get(dir.toString, "sub", "b.TXT"), "beta doc")
    Files.writeString(Paths.get(dir.toString, "sub/deep", "c.Txt"), "gamma doc")
    Files.writeString(Paths.get(dir.toString, "skip.md"), "not text")
    Files.writeString(Paths.get(dir.toString, "skip.txt.bak"), "not text either")

    val df = TextCorpus.read(spark, dir.toString)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length === 3)
    assert(rows.map(_._2).sorted.toSeq === Seq("alpha doc", "beta doc", "gamma doc"))
    assert(rows.forall(_._1.toLowerCase.endsWith("txt")))
  }

  test("encoding tolerance: invalid UTF-8 bytes decode with replacement, never fail") {
    val dir = Files.createTempDirectory("graft_corpus_enc_")
    // latin-1 bytes that are invalid UTF-8 (0xE9 = é in latin-1)
    Files.write(Paths.get(dir.toString, "l1.txt"),
      Array[Byte]('c', 'a', 'f', 0xE9.toByte, ' ', 'o', 'k'))
    val out = TextCorpus.read(spark, dir.toString).collect()
    assert(out.length === 1)
    val text = out(0).getString(1)
    assert(text.startsWith("caf") && text.endsWith(" ok"))
    assert(text.contains("�"), s"expected replacement char in: $text")
  }

  test("preview: 5000-char cap with truncation marker (reference constants)") {
    import spark.implicits._
    val long = "x" * 6000
    val df = Seq(("p1", long), ("p2", "short")).toDF("file_path", "text")
    val prev = TextCorpus.preview(df).collect().map(r =>
      r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(prev("p1")._2 === true)
    assert(prev("p1")._1 ===
      ("x" * TextCorpus.PreviewCharLimit) + TextCorpus.PreviewTruncationMarker)
    assert(prev("p2") === ("short", false))
  }

  test("versioned sink: each run is its own directory (the backup semantics)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sink_").toString
    val v1 = TextCorpus.write(Seq(("a", "one")).toDF("file_path", "text"), out, "001")
    val v2 = TextCorpus.write(Seq(("a", "two")).toDF("file_path", "text"), out, "002")
    assert(spark.read.parquet(v1).collect()(0).getString(1) === "one")
    assert(spark.read.parquet(v2).collect()(0).getString(1) === "two")
  }
}
