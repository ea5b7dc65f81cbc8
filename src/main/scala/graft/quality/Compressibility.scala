package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** zlib compression-ratio quality signal — the MassiveText/RefinedWeb
  * "compressibility" filter family: machine-generated or templated text
  * compresses far better than natural prose, and binary-ish noise far
  * worse, so the deflate ratio is a cheap single-pass repetition +
  * gibberish detector that needs no model. (Reference analog: none —
  * CorpusAid's heuristics are regex/ratio rules, `src/CorpusAid.py:
  * 446-520`; this is the corpus-hygiene signal a trillion-token pipeline
  * adds.)
  *
  * Exactness design: the contract is ALL-INTEGER — `n_bytes` (UTF-8
  * length) and `z_bytes` (zlib level 6, default strategy/zlib-wrapped
  * framing). The JDK's Deflater and CPython's `zlib.compress` produce
  * BYTE-IDENTICAL streams at the same level (verified on the full sf0.01
  * corpus plus megabyte-scale mixed/repetitive/patterned inputs — both
  * bundle canonical madler zlib), so the independent Python oracle
  * (tools/gen_compress_golden.py) replicates `z_bytes` exactly and the
  * keep thresholds apply by integer cross-multiplication, no floating
  * point anywhere.
  *
  * keep rule: documents under `MinBytes` are exempt (the ratio is
  * meaningless at tiny sizes — deflate framing dominates); otherwise keep
  * iff `LowPct·n ≤ 100·z ≤ HighPct·n` — under the floor means highly
  * repetitive/templated, over the ceiling means incompressible noise.
  *
  * 100-TB shape: one narrow ZERO-SHUFFLE map pass; the deflate cost is
  * per-row CPU (tens of MB/s/core) with a constant 64 KiB scratch buffer
  * per partition — no text ever shuffles and nothing aggregates.
  */
object Compressibility {

  /** Ratio floor/ceiling in percent, and the small-doc exemption. */
  val LowPct = 30
  val HighPct = 110
  val MinBytes = 64

  /** Compressed size under zlib level 6 (bytes discarded — only the
    * length is the signal). */
  def zlen(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, false)
    try zlenWith(d, new Array[Byte](65536), bytes)
    finally d.end()
  }

  /** The counting loop against a caller-owned (reusable) Deflater +
    * scratch buffer — `reset()` restores the initial-stream state, so a
    * per-partition instance gives byte-identical lengths to a fresh one
    * (asserted in the spec) without a native allocation per row. */
  def zlenWith(
      d: java.util.zip.Deflater,
      buf: Array[Byte],
      bytes: Array[Byte]
  ): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  /** keep = small-doc exemption, else the integer ratio band. */
  def keep(nBytes: Long, zBytes: Long): Boolean =
    nBytes < MinBytes ||
      (zBytes * 100 >= LowPct.toLong * nBytes &&
        zBytes * 100 <= HighPct.toLong * nBytes)

  /** One narrow zero-shuffle pass: (idCol, n_bytes, z_bytes, keep). */
  def apply(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // one native Deflater + scratch buffer per partition, reset per
        // row — no per-row native allocation on the 100-TB path
        val d = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](65536)
        it.map { case (id, text) =>
          val b = (if (text == null) "" else text)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val z = zlenWith(d, buf, b)
          (id, b.length.toLong, z, keep(b.length.toLong, z))
        }
      }
      .toDF(idCol, "n_bytes", "z_bytes", "keep")
  }
}
