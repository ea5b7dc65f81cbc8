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

  test("charset detection: latin-1/cp1252/UTF-16/BOM files decode correctly, never fail") {
    val dir = Files.createTempDirectory("graft_corpus_enc_")
    // latin-1 bytes invalid as UTF-8 (0xE9 = é) — detector must pick cp1252
    Files.write(Paths.get(dir.toString, "l1.txt"),
      Array[Byte]('c', 'a', 'f', 0xE9.toByte, ' ', 'o', 'k'))
    // windows-1252-specific range: 0x93/0x94 curly quotes, 0x97 em-dash
    Files.write(Paths.get(dir.toString, "cp1252.txt"),
      Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte, ' ', 0x97.toByte, ' ', 'x'))
    // UTF-16LE with BOM, UTF-16BE without BOM, UTF-8 with BOM
    Files.write(Paths.get(dir.toString, "u16le.txt"),
      "café sixteen le".getBytes("UTF-16LE") match {
        case b => Array[Byte](0xFF.toByte, 0xFE.toByte) ++ b
      })
    Files.write(Paths.get(dir.toString, "u16be.txt"),
      "plain sixteen be".getBytes("UTF-16BE"))
    Files.write(Paths.get(dir.toString, "u8bom.txt"),
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "café utf8".getBytes("UTF-8"))
    // plain UTF-8 multibyte must stay UTF-8
    Files.write(Paths.get(dir.toString, "u8.txt"), "café 中文".getBytes("UTF-8"))

    val out = TextCorpus.readWithEncoding(spark, dir.toString).collect()
      .map(r => Paths.get(r.getString(0).stripPrefix("file:")).getFileName.toString ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(out.size === 6)
    assert(out("l1.txt") === (("café ok", "windows-1252")))
    assert(out("cp1252.txt") === (("“hi” — x", "windows-1252")))
    assert(out("u16le.txt") === (("café sixteen le", "UTF-16LE")))
    assert(out("u16be.txt") === (("plain sixteen be", "UTF-16BE")))
    assert(out("u8bom.txt") === (("café utf8", "UTF-8"))) // BOM stripped
    assert(out("u8.txt") === (("café 中文", "UTF-8")))
  }

  test("gzipped corpora: .txt.gz decompresses before charset detection; corrupt gz is total") {
    val dir = Files.createTempDirectory("graft_corpus_gz_")
    def gz(bytes: Array[Byte]): Array[Byte] = {
      val bas = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bas)
      g.write(bytes); g.close()
      bas.toByteArray
    }
    Files.write(Paths.get(dir.toString, "plain.txt"), "plain text".getBytes("UTF-8"))
    Files.write(Paths.get(dir.toString, "zipped.txt.gz"), gz("gzipped café".getBytes("UTF-8")))
    // cp1252 bytes INSIDE the gzip member — the ladder must see the
    // decompressed payload, not the gzip frame
    Files.write(Paths.get(dir.toString, "zipped1252.TXT.gz"),
      gz(Array[Byte](0x93.toByte, 'g', 'z', 0x94.toByte)))
    // gzip magic but truncated stream: falls back to raw-byte decode, never throws
    Files.write(Paths.get(dir.toString, "corrupt.txt.gz"),
      Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte))
    // uppercase .GZ suffix must match too (legacy/Windows tooling)
    Files.write(Paths.get(dir.toString, "upper.TXT.GZ"),
      gz("upper gz".getBytes("UTF-8")))

    val out = TextCorpus.readWithEncoding(spark, dir.toString).collect()
      .map(r => Paths.get(r.getString(0).stripPrefix("file:")).getFileName.toString ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(out.size === 5)
    assert(out("upper.TXT.GZ")._1 === "upper gz")
    assert(out("plain.txt")._1 === "plain text")
    assert(out("zipped.txt.gz") === (("gzipped café", "UTF-8")))
    assert(out("zipped1252.TXT.gz") === (("“gz”", "windows-1252")))
    assert(out.contains("corrupt.txt.gz")) // present, decoded with replacement
  }

  test("jsonl transcripts: typed parse, malformed + key-incomplete lines quarantined, round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_")
    val lines = Seq(
      """{"conv_id":"c1","turn_idx":0,"role":"user","text":"hello there","tool":"","ts":"2026-01-01T10:00:00"}""",
      """{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"hi!","tool":"search","ts":"2026-01-01T10:00:05.250"}""",
      """{"conv_id":"c2","turn_idx":0,"text":"no role or tool or ts"}""", // optional fields null -> defaulted
      """{"conv_id":"c3","turn_idx":null,"text":"missing required turn_idx"}""", // -> quarantine
      """{"turn_idx":7,"text":"missing conv_id"}""", // -> quarantine
      """{not json at all""", // -> quarantine (malformed)
      """{"conv_id":"c4","turn_idx":0,"role":"user","text":"fine","tool":"","ts":null}"""
    )
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val parsed = graft.sources.JsonlTranscripts.read(spark, dir.toString)
    val turns = parsed.turns.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    assert(turns === Set(("c1", 0), ("c1", 1), ("c2", 0), ("c4", 0)))
    // optional STRING defaults are total; ts stays NULLABLE by contract
    // (a fabricated epoch sentinel would be driver-timezone-dependent and
    // indistinguishable from a real timestamp for backfill)
    parsed.turns.collect().foreach { t =>
      assert(t.role != null && t.tool != null)
    }
    assert(parsed.turns.filter($"ts".isNull).count() > 0,
      "rows with missing ts must keep ts null, not a sentinel")
    val q = parsed.quarantine.select("reason").as[String].collect().sorted
    assert(q === Array("malformed_json", "missing_required_key", "missing_required_key"))
    // the raw line is preserved for malformed records
    assert(parsed.quarantine.filter($"reason" === "malformed_json")
      .select("raw").as[String].head().contains("{not json"))

    // round-trip through the JSONL sink
    val out = dir.resolve("export").toString
    graft.sources.JsonlTranscripts.write(parsed.turns, out)
    val back = graft.sources.JsonlTranscripts.read(spark, out)
    assert(back.quarantine.isEmpty)
    assert(back.turns.collect().toSet === parsed.turns.collect().toSet)
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

  test("preview batch paging: 20 per page in path order, capped display") {
    import spark.implicits._
    val df = (1 to 47).map(i => (f"p$i%03d", s"text $i")).toDF("file_path", "text")
    val p0 = TextCorpus.previewBatch(df, 0).collect().map(_.getString(0))
    val p1 = TextCorpus.previewBatch(df, 1).collect().map(_.getString(0))
    val p2 = TextCorpus.previewBatch(df, 2).collect().map(_.getString(0))
    assert(p0.length === 20 && p0.head === "p001" && p0.last === "p020")
    assert(p1.length === 20 && p1.head === "p021")
    assert(p2.length === 7 && p2.last === "p047")
    assert(TextCorpus.previewBatch(df, 3).count() === 0)
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
