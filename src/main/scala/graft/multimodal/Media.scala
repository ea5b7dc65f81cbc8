package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decode / feature-extract / frame-sample as
  * deterministic per-partition operators.
  *
  * The container ships no codec libraries, so the formats are REAL but
  * codec-free ones whose byte layouts are fully public and decodable in
  * pure JVM code:
  *
  *   - image: BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed
  *     24-bpp, bottom-up rows padded to 4 bytes)
  *   - audio: WAV (RIFF/WAVE with `fmt ` + `data` chunks, 16-bit PCM)
  *   - video: Y4M (YUV4MPEG2 ASCII header + FRAME-delimited raw 4:2:0
  *     planes)
  *
  * [[decode]] parses the actual byte layouts (magic, chunk walks, bounds
  * checks — never throws, `valid=false` on garbage/truncation) and
  * [[features]] computes real signal statistics from the decoded samples
  * (luminance histogram / RMS energy envelope / per-frame luma histogram).
  * Swapping in a JPEG/FLAC/H.264 codec binding changes no plan shape —
  * the Spark-side contract (binary → typed struct, metadata projected
  * before any shuffle) is format-agnostic.
  *
  * Metadata field semantics per kind:
  *   - image: width/height px, nFrames = 1, payloadBytes = pixel bytes
  *   - audio: width = sampleRate, height = nSamples, nFrames = 0,
  *     payloadBytes = PCM data-chunk bytes
  *   - video: width/height px, nFrames = frame count, payloadBytes =
  *     total raw frame bytes (nFrames · w·h·3/2)
  */
object Media {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaMeta(
      kind: String,
      width: Int,
      height: Int,
      nFrames: Int,
      payloadBytes: Int,
      valid: Boolean
  )

  private val kinds = Array("image", "audio", "video")

  private def invalid(content: Array[Byte]): MediaMeta =
    MediaMeta("unknown", 0, 0, 0,
      if (content == null) 0 else content.length, valid = false)

  // -- little-endian helpers (BMP and WAV are little-endian formats) -------

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // -- writers (the deterministic synthesizer's encoders) ------------------

  /** Uncompressed 24-bpp bottom-up BMP; `pix` is row-major top-down BGR. */
  def writeBmp(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h * 3, "pix must be w*h*3 BGR bytes")
    val rowSize = (3 * w + 3) / 4 * 4
    val imageSize = rowSize * h
    val buf = new Array[Byte](54 + imageSize)
    buf(0) = 'B'; buf(1) = 'M'
    putLe32(buf, 2, buf.length) // file size
    putLe32(buf, 10, 54) // pixel data offset
    putLe32(buf, 14, 40) // BITMAPINFOHEADER size
    putLe32(buf, 18, w)
    putLe32(buf, 22, h) // positive = bottom-up
    putLe16(buf, 26, 1) // planes
    putLe16(buf, 28, 24) // bpp
    putLe32(buf, 30, 0) // BI_RGB (uncompressed)
    putLe32(buf, 34, imageSize)
    putLe32(buf, 38, 2835); putLe32(buf, 42, 2835) // 72 dpi
    var y = 0
    while (y < h) {
      // bottom-up: file row y holds image row (h-1-y)
      System.arraycopy(pix, (h - 1 - y) * w * 3, buf, 54 + y * rowSize, w * 3)
      y += 1
    }
    buf
  }

  /** Mono 16-bit PCM WAV. */
  def writeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = new Array[Byte](44 + dataLen)
    buf(0) = 'R'; buf(1) = 'I'; buf(2) = 'F'; buf(3) = 'F'
    putLe32(buf, 4, 36 + dataLen)
    buf(8) = 'W'; buf(9) = 'A'; buf(10) = 'V'; buf(11) = 'E'
    buf(12) = 'f'; buf(13) = 'm'; buf(14) = 't'; buf(15) = ' '
    putLe32(buf, 16, 16) // PCM fmt chunk size
    putLe16(buf, 20, 1) // PCM
    putLe16(buf, 22, 1) // mono
    putLe32(buf, 24, sampleRate)
    putLe32(buf, 28, sampleRate * 2) // byte rate
    putLe16(buf, 32, 2) // block align
    putLe16(buf, 34, 16) // bits/sample
    buf(36) = 'd'; buf(37) = 'a'; buf(38) = 't'; buf(39) = 'a'
    putLe32(buf, 40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(buf, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    buf
  }

  /** YUV4MPEG2 with raw 4:2:0 frames; `frames` are w·h·3/2 bytes each. */
  def writeY4m(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val frameSize = w * h * 3 / 2
    require(frames.forall(_.length == frameSize), s"frames must be $frameSize bytes")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val buf = new Array[Byte](header.length + frames.size * (marker.length + frameSize))
    System.arraycopy(header, 0, buf, 0, header.length)
    var off = header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, buf, off, marker.length); off += marker.length
      System.arraycopy(f, 0, buf, off, frameSize); off += frameSize
    }
    buf
  }

  // -- synthesizer ---------------------------------------------------------

  /** Deterministic synthetic media corpus: real BMP/WAV/Y4M bytes whose
    * content is a pure function of (seed, id). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 21L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(1, (n / 256 + 1).toInt)).map { id =>
      val h = mix64(seed ^ id)
      val kindIdx = ((h >>> 8) % 3).toInt
      var s = mix64(h)
      def nextByte(): Byte = { s = mix64(s); (s & 0xff).toByte }
      val content = kindIdx match {
        case 0 => // image: even 16..48 px sides
          val w = 16 + 2 * ((h >>> 16) % 17).toInt
          val ht = 16 + 2 * ((h >>> 24) % 17).toInt
          val pix = Array.fill(w * ht * 3)(nextByte())
          writeBmp(w, ht, pix)
        case 1 => // audio: 8/16/24 kHz mono, 200..999 samples
          val rate = 8000 * (1 + ((h >>> 16) % 3).toInt)
          val nSamples = 200 + ((h >>> 24) % 800).toInt
          val samples = Array.fill(nSamples) {
            s = mix64(s); (s & 0xffff).toShort
          }
          writeWav(rate, samples)
        case _ => // video: even 16..32 px sides, 2..7 frames
          val w = 16 + 2 * ((h >>> 16) % 9).toInt
          val ht = 16 + 2 * ((h >>> 24) % 9).toInt
          val nFrames = 2 + ((h >>> 32) % 6).toInt
          val frames = Seq.fill(nFrames)(Array.fill(w * ht * 3 / 2)(nextByte()))
          writeY4m(w, ht, frames)
      }
      MediaRow(id, kinds(kindIdx), content)
    }
  }

  // -- decoders ------------------------------------------------------------

  private def decodeBmp(b: Array[Byte]): MediaMeta = {
    if (b.length < 54) return invalid(b)
    val dataOffset = le32(b, 10)
    val biSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    // LONG abs: abs(Int.MinValue) stays negative in Int and would slip
    // through the h check; all derived sizes computed in Long so a huge
    // declared width cannot wrap the bounds arithmetic
    val h = math.abs(hRaw.toLong) // negative height = top-down rows
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (biSize < 40 || w <= 0 || h <= 0 || bpp != 24 || compression != 0)
      return invalid(b)
    val rowSize = (3L * w + 3) / 4 * 4
    // header must be in bounds and the file must hold every pixel row
    if (dataOffset < 54 || dataOffset > b.length ||
      b.length - dataOffset < rowSize * h) return invalid(b)
    // bounded by the buffer (checked above), so the Int narrowing is safe
    MediaMeta("image", w, h.toInt, 1, (3L * w * h).toInt, valid = true)
  }

  private def decodeWav(b: Array[Byte]): MediaMeta = {
    if (b.length < 12 || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return invalid(b)
    // chunk walk: fmt (rate, channels, bits) then data (sample bytes).
    // Offsets and sizes are LONG (size read as unsigned-32): a declared
    // chunk size near 2^31 would otherwise wrap `off + 8 + size` negative,
    // pass the bounds check, and index out of bounds on the next iteration
    var off = 12L
    var rate = 0; var blockAlign = 0; var fmtOk = false
    var dataLen = -1L
    while (off + 8 <= b.length && (!fmtOk || dataLen < 0)) {
      val o = off.toInt
      val size = le32(b, o + 4).toLong & 0xffffffffL
      if (off + 8 + size > b.length) return invalid(b)
      val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
      val isData = b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a'
      if (isFmt && size >= 16) {
        val audioFormat = le16(b, o + 8)
        val channels = le16(b, o + 10)
        rate = le32(b, o + 12)
        blockAlign = le16(b, o + 20)
        val bitsPerSample = le16(b, o + 22)
        // features() walks the samples as 16-bit mono (2-byte stride), so
        // decode validity must match that assumption: a stereo or 8-bit PCM
        // file would decode "valid" with misread sample counts / energy bins
        fmtOk = audioFormat == 1 && channels == 1 && bitsPerSample == 16 &&
          rate > 0 && blockAlign > 0
        if (!fmtOk) return invalid(b)
      } else if (isData) dataLen = size
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataLen < 0) return invalid(b)
    // dataLen proved <= b.length above, so the Int narrowing is safe
    MediaMeta("audio", rate, (dataLen / blockAlign).toInt, 0, dataLen.toInt,
      valid = true)
  }

  private def decodeY4m(b: Array[Byte]): MediaMeta = {
    val eol = b.indexOf('\n'.toByte)
    if (eol < 0 || eol > 256) return invalid(b)
    val header = new String(b, 0, eol, java.nio.charset.StandardCharsets.US_ASCII)
    var w = 0; var h = 0
    val toks = header.split(' ')
    var ti = 1 // token 0 is the "YUV4MPEG2" magic
    while (ti < toks.length) {
      val tok = toks(ti)
      try {
        if (tok.startsWith("W")) w = tok.substring(1).toInt
        else if (tok.startsWith("H")) h = tok.substring(1).toInt
      } catch { case _: NumberFormatException => w = -1 }
      ti += 1
    }
    if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0) return invalid(b)
    // LONG frame size: W30000 H30000 would wrap the Int product negative,
    // pass the remaining-bytes guard, and drive `off` out of bounds
    val frameSize = w.toLong * h * 3 / 2
    var off = (eol + 1).toLong
    var nFrames = 0
    val F = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    while (off < b.length) {
      if (off + F.length > b.length ||
        !(0 until F.length).forall(i => b(off.toInt + i) == F(i))) return invalid(b)
      // frame header params (rare) run to the newline
      var p = off.toInt + F.length
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length || b.length - (p + 1) < frameSize) return invalid(b)
      nFrames += 1
      off = p + 1 + frameSize
    }
    if (nFrames == 0) return invalid(b)
    // nFrames * frameSize proved <= b.length, so Int narrowing is safe
    MediaMeta("video", w, h, nFrames, (nFrames * frameSize).toInt, valid = true)
  }

  /** Parse real BMP/WAV/Y4M byte layouts into typed metadata. Contract:
    * never throws; `valid=false` on garbage, unknown magic, or a header
    * whose promised sizes exceed the actual bytes. */
  def decode(content: Array[Byte]): MediaMeta = {
    if (content == null || content.length < 12) return invalid(content)
    val b = content
    if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') decodeWav(b)
    else if (b.length >= 10 &&
      new String(b, 0, 9, java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2")
      decodeY4m(b)
    else invalid(b)
  }

  // -- feature extraction (real signal statistics, L2-normalized) ----------

  private def l2(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }

  /** Content features from the DECODED samples — the embedding-model
    * stand-in, but computed from real pixel/PCM/frame data:
    *   - image: `dim`-bin luminance histogram (BT.601 luma of the BGR
    *     pixels, padding bytes excluded)
    *   - audio: RMS energy envelope over `dim` equal sample windows
    *   - video: `dim`-bin luma histogram over every frame's Y plane
    * Invalid media → zero vector (callers filter on decode().valid). */
  def features(content: Array[Byte], dim: Int = 32): Array[Float] = {
    val out = new Array[Float](dim)
    val meta = decode(content)
    if (!meta.valid) return out
    meta.kind match {
      case "image" =>
        val w = meta.width; val h = meta.height
        val rowSize = (3 * w + 3) / 4 * 4
        val dataOffset = le32(content, 10)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = dataOffset + y * rowSize + 3 * x
            val bch = content(p) & 0xff
            val g = content(p + 1) & 0xff
            val r = content(p + 2) & 0xff
            val lum = (299 * r + 587 * g + 114 * bch) / 1000
            out(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
      case "audio" =>
        // locate the data chunk again (decode proved it exists)
        var off = 12
        var dataOff = -1; var dataLen = 0
        while (dataOff < 0) {
          val size = le32(content, off + 4)
          if (content(off) == 'd' && content(off + 1) == 'a' &&
            content(off + 2) == 't' && content(off + 3) == 'a') {
            dataOff = off + 8; dataLen = size
          } else off += 8 + size + (size & 1)
        }
        val nSamples = dataLen / 2
        if (nSamples > 0) {
          var i = 0
          val acc = new Array[Double](dim)
          val cnt = new Array[Int](dim)
          while (i < nSamples) {
            val v = le16(content, dataOff + 2 * i).toShort / 32768.0
            val bin = math.min(dim - 1, (i.toLong * dim / nSamples).toInt)
            acc(bin) += v * v; cnt(bin) += 1
            i += 1
          }
          var b = 0
          while (b < dim) {
            out(b) = if (cnt(b) > 0) math.sqrt(acc(b) / cnt(b)).toFloat else 0f
            b += 1
          }
        }
      case _ =>
        // video: luma histogram over each frame's Y plane, walked IN PLACE
        // over the already-validated container — going through frameSample
        // here would copy every frame's bytes just to read them once
        // (per-row allocation equal to the payload)
        val ySize = meta.width * meta.height
        framePayloadOffsets(content, meta).foreach { p =>
          var i = 0
          while (i < ySize) {
            out((content(p + i) & 0xff) * dim / 256) += 1f
            i += 1
          }
        }
    }
    l2(out)
  }

  /** Payload start offset of every frame of a DECODE-VALIDATED Y4M — the
    * single shared FRAME-chain walk (features and frameSample both consume
    * it, so the bounds reasoning lives in one place). frameSize is computed
    * in LONG first: decode accepts any container whose total frame bytes
    * fit the buffer, which a >1 GB cell can satisfy while w*h*3 alone
    * overflows Int — the validated per-frame size always fits Int. */
  private def framePayloadOffsets(content: Array[Byte], meta: MediaMeta): Iterator[Int] = {
    val frameSize = (meta.width.toLong * meta.height * 3 / 2).toInt
    new Iterator[Int] {
      private var off = content.indexOf('\n'.toByte) + 1
      private var emitted = 0
      def hasNext: Boolean = emitted < meta.nFrames
      def next(): Int = {
        var p = off
        while (content(p) != '\n') p += 1 // skip "FRAME[ params]"
        off = p + 1 + frameSize
        emitted += 1
        p + 1
      }
    }
  }

  /** Every k-th frame's raw 4:2:0 bytes of a Y4M video; empty for
    * non-video/corrupt input ([[decode]] already rejects any container
    * whose FRAME chain or sizes are inconsistent, so the offsets here are
    * proven in-bounds). */
  def frameSample(content: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
    val meta = decode(content)
    if (!meta.valid || meta.kind != "video") return Nil
    val frameSize = (meta.width.toLong * meta.height * 3 / 2).toInt
    framePayloadOffsets(content, meta).zipWithIndex.collect {
      case (p, idx) if idx % math.max(1, everyK) == 0 =>
        java.util.Arrays.copyOfRange(content, p, p + frameSize)
    }.toSeq
  }

  // -- Spark-side plumbing -------------------------------------------------

  /** Metadata projection — the pattern that matters at scale: decode ONCE,
    * project the small typed struct, and drop the wide binary before any
    * shuffle/aggregation. */
  def withMeta(media: Dataset[MediaRow]): DataFrame = {
    val dec = udf((b: Array[Byte]) => decode(b))
    media.toDF().withColumn("meta", dec(col("content")))
  }

  def metaSummary(media: Dataset[MediaRow]): DataFrame =
    withMeta(media)
      .select(col("media_id"), col("meta.*")) // binary column dropped pre-shuffle
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("payloadBytes")).as("total_payload"),
        avg(col("width")).as("avg_width"),
        max(col("nFrames")).as("max_frames"))
      .orderBy("kind")

  def features(media: Dataset[MediaRow], dim: Int): DataFrame = {
    val f = udf((b: Array[Byte]) => features(b, dim))
    media.toDF().select(col("media_id").as("vec_id"), f(col("content")).as("embedding"))
  }

  def features(media: Dataset[MediaRow]): DataFrame = features(media, 32)
}
