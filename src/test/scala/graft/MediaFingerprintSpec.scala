package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media
import graft.text.Fingerprint

class MediaFingerprintSpec extends AnyFunSuite with SparkTestBase {

  test("media synth + decode: every row decodes valid with consistent meta") {
    import spark.implicits._
    val media = Media.synthesize(spark, 300)
    val metas = Media.withMeta(media)
      .select(col("kind"), col("meta.kind").as("decoded"), col("meta.valid"),
        col("meta.payloadBytes"), octet_length(col("content")).as("len"))
      .collect()
    assert(metas.length === 300)
    metas.foreach { r =>
      assert(r.getBoolean(2), "decode must report valid")
      assert(r.getString(0) === r.getString(1), "declared kind == decoded kind")
      assert(r.getInt(3) > 0 && r.getInt(3) <= r.getInt(4),
        "payload bytes positive and bounded by the container size")
    }
  }

  test("decode parses real format headers bit-for-bit") {
    // BMP: a hand-built 2x2 24-bpp image (known byte layout, row padding)
    val bmp = Media.writeBmp(2, 2, Array.tabulate(12)(i => (i * 7).toByte))
    val bm = Media.decode(bmp)
    assert(bm.valid && bm.kind === "image" && bm.width === 2 &&
      bm.height === 2 && bm.nFrames === 1 && bm.payloadBytes === 12)
    assert(bmp.length === 54 + 2 * 8, "2 rows of 6 pixel bytes padded to 8")

    // WAV: 16-bit mono PCM, 5 samples at 8 kHz
    val wav = Media.writeWav(8000, Array[Short](0, 100, -100, 32767, -32768))
    val wm = Media.decode(wav)
    assert(wm.valid && wm.kind === "audio" && wm.width === 8000 &&
      wm.height === 5 && wm.nFrames === 0 && wm.payloadBytes === 10)

    // Y4M: 4x2 4:2:0, 3 frames of 12 bytes
    val y4m = Media.writeY4m(4, 2, Seq.fill(3)(Array.fill[Byte](12)(9)))
    val ym = Media.decode(y4m)
    assert(ym.valid && ym.kind === "video" && ym.width === 4 &&
      ym.height === 2 && ym.nFrames === 3 && ym.payloadBytes === 36)
  }

  test("decode never throws on garbage/truncation and flags invalid") {
    assert(!Media.decode(null).valid)
    assert(!Media.decode(Array[Byte](1, 2, 3)).valid)
    assert(!Media.decode("no recognizable magic in this buffer".getBytes).valid)
    val bmp = Media.writeBmp(4, 4, new Array[Byte](48))
    val wav = Media.writeWav(8000, new Array[Short](64))
    val y4m = Media.writeY4m(4, 4, Seq.fill(2)(new Array[Byte](24)))
    for (full <- Seq(bmp, wav, y4m); cut <- Seq(4, 11, 20, full.length - 1)) {
      val t = java.util.Arrays.copyOfRange(full, 0, cut)
      assert(!Media.decode(t).valid, s"truncation at $cut must be invalid")
    }
    // header lies: BMP promising more pixel rows than the file holds
    val lying = bmp.clone()
    lying(22) = 100.toByte // height LE byte 0 -> 100 rows
    assert(!Media.decode(lying).valid)
    // WAV data chunk claiming bytes past EOF
    val wavLie = wav.clone()
    wavLie(40) = wav.length.toByte; wavLie(41) = 1
    assert(!Media.decode(wavLie).valid)
    // fmt variants features() cannot walk (it assumes 16-bit mono, 2-byte
    // stride): stereo and 8-bit PCM must decode invalid, not misread
    val wavStereo = wav.clone()
    wavStereo(22) = 2 // channels = 2
    assert(!Media.decode(wavStereo).valid)
    val wav8bit = wav.clone()
    wav8bit(34) = 8 // bits/sample = 8
    assert(!Media.decode(wav8bit).valid)
  }

  test("decode rejects Int-overflow header attacks without throwing") {
    // WAV: junk chunk declaring size 0x7FFFFFF4 — `off + 8 + size` would
    // wrap negative in Int arithmetic and pass the bounds check
    val wavWrap = new Array[Byte](20)
    "RIFF".getBytes.copyToArray(wavWrap, 0)
    "WAVE".getBytes.copyToArray(wavWrap, 8)
    "JUNK".getBytes.copyToArray(wavWrap, 12)
    wavWrap(16) = 0xf4.toByte; wavWrap(17) = 0xff.toByte
    wavWrap(18) = 0xff.toByte; wavWrap(19) = 0x7f.toByte
    assert(!Media.decode(wavWrap).valid)
    // WAV: valid fmt then data size ~2^31 — must not return valid=true
    // with a payload beyond the buffer
    val wavBig = Media.writeWav(8000, new Array[Short](16))
    wavBig(40) = 0x00; wavBig(41) = 0xff.toByte
    wavBig(42) = 0xff.toByte; wavBig(43) = 0x7f.toByte
    assert(!Media.decode(wavBig).valid)
    // Y4M: 30000x30000 frame size wraps the Int product negative
    val y4mWrap = "YUV4MPEG2 W30000 H30000\nFRAME\n".getBytes("US-ASCII")
    assert(!Media.decode(y4mWrap).valid)
    assert(Media.frameSample(y4mWrap, 1).isEmpty)
    assert(Media.features(y4mWrap).forall(_ == 0f))
    // BMP: width 715827883 wraps rowSize negative; and height
    // Int.MinValue survives math.abs in Int arithmetic
    val bmpWrap = Media.writeBmp(4, 4, new Array[Byte](48))
    val wBytes = 715827883
    bmpWrap(18) = wBytes.toByte; bmpWrap(19) = (wBytes >>> 8).toByte
    bmpWrap(20) = (wBytes >>> 16).toByte; bmpWrap(21) = (wBytes >>> 24).toByte
    assert(!Media.decode(bmpWrap).valid)
    val bmpMinH = Media.writeBmp(4, 4, new Array[Byte](48))
    bmpMinH(22) = 0; bmpMinH(23) = 0; bmpMinH(24) = 0; bmpMinH(25) = 0x80.toByte
    assert(!Media.decode(bmpMinH).valid)
  }

  test("Y4M frame-level parameters (FRAME Ixyz) are tolerated per spec") {
    // the YUV4MPEG2 spec allows per-frame params after the FRAME magic;
    // our writer never emits them but real-world files do
    val plain = Media.writeY4m(4, 2, Seq.fill(2)(Array.fill[Byte](12)(3)))
    val withParams = {
      val head = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1\n".getBytes("US-ASCII")
      val f1 = "FRAME Ixyz\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(3)
      val f2 = "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(3)
      head ++ f1 ++ f2
    }
    val m = Media.decode(withParams)
    assert(m.valid && m.nFrames === 2 && m.payloadBytes === 24)
    assert(Media.frameSample(withParams, 1).map(_.toSeq) ===
      Media.frameSample(plain, 1).map(_.toSeq))
    assert(Media.features(withParams).toSeq === Media.features(plain).toSeq)
  }

  test("meta summary drops the binary before the shuffle") {
    import spark.implicits._
    val media = Media.synthesize(spark, 200)
    val summary = Media.metaSummary(media)
    val plan = summary.queryExecution.optimizedPlan.toString
    // the aggregate input must not carry the content column
    val aggLine = plan.linesIterator.find(_.contains("Aggregate")).getOrElse("")
    assert(!aggLine.contains("content"), s"binary column reached the aggregate: $aggLine")
    val rows = summary.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum === 200)
  }

  test("frame sampling: video frames sliced deterministically, non-video empty") {
    import spark.implicits._
    val media = Media.synthesize(spark, 100).collect()
    val video = media.find(_.kind == "video").get
    val meta = Media.decode(video.content)
    val frameSize = meta.width * meta.height * 3 / 2
    val all = Media.frameSample(video.content, 1)
    assert(all.size === meta.nFrames)
    assert(all.forall(_.length === frameSize))
    val every2 = Media.frameSample(video.content, 2)
    assert(every2.size === (meta.nFrames + 1) / 2)
    assert(every2.head.toSeq === all.head.toSeq)
    val audio = media.find(_.kind == "audio").get
    assert(Media.frameSample(audio.content, 1).isEmpty)

    // a truncated container (last frame cut short) must yield NO frames
    // rather than throw or return a partial frame — decode rejects the
    // inconsistent FRAME chain outright
    val corrupt = java.util.Arrays.copyOfRange(
      video.content, 0, video.content.length - frameSize / 2)
    assert(Media.frameSample(corrupt, 1).isEmpty)
  }

  test("features are real signal statistics, deterministic, unit-norm") {
    // image: a flat black BMP puts ALL mass in luminance bin 0
    val black = Media.features(Media.writeBmp(4, 4, new Array[Byte](48)))
    assert(math.abs(black(0) - 1.0f) < 1e-6 && black.drop(1).forall(_ == 0f))
    // a flat white BMP puts all mass in the TOP bin
    val white = Media.features(Media.writeBmp(4, 4, Array.fill[Byte](48)(255.toByte)))
    assert(math.abs(white.last - 1.0f) < 1e-6 && white.dropRight(1).forall(_ == 0f))
    // audio: silence -> zero envelope; full-scale square wave -> flat envelope
    val silence = Media.features(Media.writeWav(8000, new Array[Short](640)))
    assert(silence.forall(_ == 0f))
    val loud = Media.features(Media.writeWav(8000,
      Array.tabulate[Short](640)(i => if (i % 2 == 0) 32767 else -32767)))
    assert(loud.forall(v => math.abs(v - loud(0)) < 1e-4), "flat RMS envelope")
    // garbage -> zero vector, never a throw
    assert(Media.features("not media".getBytes).forall(_ == 0f))
    // determinism over the synthesized corpus
    val m = Media.synthesize(spark, 20).collect()
    m.foreach { r =>
      assert(Media.features(r.content).toSeq === Media.features(r.content).toSeq)
    }
  }

  test("media features feed the ANN operator end-to-end") {
    import spark.implicits._
    val media = Media.synthesize(spark, 200)
    val feats = Media.features(media)
    val queries = feats.as[(Long, Array[Float])].filter(_._1 < 3).collect()
    val topk = graft.sim.Ann.bruteForceTopK(spark, feats, queries, k = 5).collect()
    assert(topk.length === 15)
    // self-similarity must rank first with score ~1
    queries.foreach { case (qid, _) =>
      val self = topk.find(r => r.getLong(0) == qid && r.getInt(3) == 1).get
      assert(self.getLong(1) === qid)
      assert(math.abs(self.getDouble(2) - 1.0) < 1e-5)
    }
  }

  test("winnowing fingerprints: shared passage detected, unrelated not") {
    val base = "the committee approved the budget after a short discussion about energy markets and regional growth"
    val plagiarized = "INTRO TEXT. " + base + " AND A DIFFERENT ENDING APPENDED"
    val unrelated = "completely different content with no overlap whatsoever in any passage of this sentence"
    val fb = Fingerprint.winnow(base)
    val fp = Fingerprint.winnow(plagiarized)
    val fu = Fingerprint.winnow(unrelated)
    assert(Fingerprint.containment(fb, fp) > 0.7,
      s"containment = ${Fingerprint.containment(fb, fp)}")
    assert(Fingerprint.containment(fb, fu) < 0.05)
    // deterministic
    assert(Fingerprint.winnow(base).toSeq === fb.toSeq)
  }

  test("rolling hash windows: winnow output is subset of all k-gram hashes") {
    val t = "some reasonably long text for rolling hash window checks here"
    val all = Fingerprint.rollingHashes(t, 5).toSet
    assert(Fingerprint.winnow(t, 5, 4).forall(all.contains))
  }
}
