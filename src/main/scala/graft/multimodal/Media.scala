package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decode / feature-extract / frame-sample as
  * deterministic per-partition operators.
  *
  * The image/audio codecs are NOT in this container, so the byte-level
  * decode is a clearly-marked STUB over a self-describing synthetic
  * container format ("GRFT"); everything Spark-side — schema, batch
  * iteration, keeping wide binary out of shuffles by projecting metadata
  * first — is real and tested. Swapping `decodeStub` for a JNI/javacv codec
  * changes no plan shape.
  *
  * GRFT container layout (big-endian):
  *   bytes 0-3  magic "GRFT"
  *   byte  4    kind: 0=image 1=audio 2=video
  *   bytes 5-8  width  (image/video) | sampleRate (audio)
  *   bytes 9-12 height (image/video) | nSamples   (audio)
  *   bytes 13-16 nFrames (video; 1 for image, 0 for audio)
  *   rest       payload (deterministic pseudo-pixels/samples)
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

  private val MAGIC = Array[Byte]('G', 'R', 'F', 'T')
  private val kinds = Array("image", "audio", "video")

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Deterministic synthetic media corpus. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 21L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(1, (n / 256 + 1).toInt)).map { id =>
      val h = mix64(seed ^ id)
      val kindIdx = ((h >>> 8) % 3).toInt
      val w = 16 + ((h >>> 16) % 48).toInt
      val ht = 16 + ((h >>> 24) % 48).toInt
      val frames = kindIdx match {
        case 0 => 1
        case 1 => 0
        case 2 => 2 + ((h >>> 32) % 6).toInt
      }
      val payloadLen = kindIdx match {
        case 1 => w * 4 // "samples"
        case _ => w * ht * math.max(1, frames) / 8
      }
      val buf = new Array[Byte](17 + payloadLen)
      System.arraycopy(MAGIC, 0, buf, 0, 4)
      buf(4) = kindIdx.toByte
      putInt(buf, 5, w); putInt(buf, 9, ht); putInt(buf, 13, frames)
      var i = 0
      var s = mix64(h)
      while (i < payloadLen) { s = mix64(s); buf(17 + i) = (s & 0xff).toByte; i += 1 }
      MediaRow(id, kinds(kindIdx), buf)
    }
  }

  /** STUB decoder — replace with a real codec binding in production; the
    * contract (binary → typed metadata struct, never throws, `valid=false`
    * on garbage) is the real part. */
  def decodeStub(content: Array[Byte]): MediaMeta = {
    if (content == null || content.length < 17 ||
      content(0) != 'G' || content(1) != 'R' || content(2) != 'F' || content(3) != 'T')
      return MediaMeta("unknown", 0, 0, 0, if (content == null) 0 else content.length, valid = false)
    // kind byte outside 0..2 (incl. negative 0x80-0xFF bytes) is garbage,
    // not an index — honor the never-throw contract with valid=false
    if (content(4) < 0 || content(4) > 2)
      return MediaMeta("unknown", 0, 0, 0, content.length - 17, valid = false)
    val kind = kinds(content(4).toInt)
    MediaMeta(kind, getInt(content, 5), getInt(content, 9), getInt(content, 13),
      content.length - 17, valid = true)
  }

  /** STUB feature extractor: 32-dim deterministic hash features of the
    * payload — stands in for an image/audio embedding model. */
  def featuresStub(content: Array[Byte], dim: Int = 32): Array[Float] = {
    val out = new Array[Float](dim)
    if (content == null) return out
    var i = 17
    while (i < content.length) {
      val h = mix64(content(i).toLong ^ (i * 0x9e3779b9L))
      out((h & 0x7fffffff).toInt % dim) += ((h >>> 33) % 1000) / 1000.0f - 0.5f
      i += 1
    }
    val n = math.sqrt(out.foldLeft(0.0)((a, x) => a + x * x))
    if (n > 0) out.map(x => (x / n).toFloat) else out
  }

  /** STUB frame sampler: every k-th "frame" slice of a video payload. */
  def frameSampleStub(content: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
    val meta = decodeStub(content)
    if (!meta.valid || meta.nFrames <= 0 || meta.kind != "video") return Nil
    // never trust the HEADER against the actual payload: a truncated or
    // corrupt container (header says 1000 frames, 10 bytes follow) must
    // not index past the buffer or materialize a giant range — clamp the
    // frame count to what the payload can physically hold
    val actualPayload = math.max(0, content.length - 17)
    if (actualPayload == 0) return Nil
    val nFrames = math.min(meta.nFrames, actualPayload)
    val frameLen = math.max(1, actualPayload / nFrames)
    (0 until nFrames by math.max(1, everyK)).flatMap { f =>
      val from = 17 + f * frameLen
      if (from >= content.length) None
      else Some(java.util.Arrays.copyOfRange(content, from,
        math.min(from + frameLen, content.length)))
    }
  }

  /** Metadata projection — the pattern that matters at scale: decode ONCE,
    * project the small typed struct, and drop the wide binary before any
    * shuffle/aggregation. */
  def withMeta(media: Dataset[MediaRow]): DataFrame = {
    val dec = udf((b: Array[Byte]) => decodeStub(b))
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

  def features(media: Dataset[MediaRow], dim: Int = 32): DataFrame = {
    val f = udf((b: Array[Byte]) => featuresStub(b, dim))
    media.toDF().select(col("media_id").as("vec_id"), f(col("content")).as("embedding"))
  }
}
