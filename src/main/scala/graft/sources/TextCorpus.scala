package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus ingestion — the reference's source path re-expressed as a
  * Spark scan (SURVEY.md §2.2):
  *
  *  - recursive directory scan for `*.txt`, case-insensitive
  *    (reference src/CorpusAid.py:751-756; Rust twin rust_preview/src/lib.rs:
  *    77-98) → `recursiveFileLookup` + `pathGlobFilter`
  *  - one file = one record (Document) → `binaryFile` + total decode
  *  - charset-detecting, never-fail decode (charset-normalizer in the
  *    report path, src/CorpusAid.py:1786-1793; chardetng in the Rust twin,
  *    rust_preview/src/lib.rs:43-57; utf-8 errors="replace" fallback,
  *    src/CorpusAid.py:141) → [[CharsetDetect.decode]]: BOM sniff, UTF-16
  *    NUL-parity heuristic, strict UTF-8 validation, windows-1252 fallback,
  *    REPLACE on malformed — a latin-1 or cp1252 corpus decodes correctly
  *    instead of mojibake
  *  - dedup by normalized path on add (src/CorpusAid.py:725-733)
  *    → dropDuplicates on the canonical path
  *  - bounded preview (5000 chars + truncation marker,
  *    src/CorpusAid.py:489-531, constant :158) → substring + flag
  */
object TextCorpus {

  val PreviewCharLimit = 5000 // reference src/CorpusAid.py:158
  val PreviewTruncationMarker =
    "\n\n[Preview truncated. Open the file to view the full contents.]"

  private val txtCaseVariants =
    Seq("txt", "TXT", "Txt", "tXt", "txT", "TXt", "TxT", "tXT")

  /** Gunzip if the payload is gzip-framed (magic 1f 8b), else pass bytes
    * through. Total: a corrupt gzip stream falls back to the raw bytes,
    * which the charset ladder then decodes with replacement — ingest never
    * throws on a bad file (same contract as [[CharsetDetect.decode]]). */
  private[sources] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      bytes
    else {
      // decompressed prefix accumulates OUTSIDE the try: a stream corrupt
      // at 99% keeps the readable 99% instead of degrading to mojibake
      // from charset-decoding the raw gzip frame
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.toByteArray
      } catch {
        case scala.util.control.NonFatal(_) =>
          if (out.size() > 0) out.toByteArray else bytes
      }
    }

  /** Load a corpus directory: one row per .txt / .txt.gz file with its
    * path, detected encoding, and the decoded text. Decode is total (never
    * throws); gzip members are decompressed before charset detection (a
    * crawled corpus ships gzipped — the binaryFile source does not
    * transparently decompress like the line-based text source does). */
  def readWithEncoding(spark: SparkSession, dir: String): DataFrame = {
    val decodeUdf = udf((bytes: Array[Byte]) =>
      CharsetDetect.decode(gunzipIfNeeded(bytes)))
    val glob = (txtCaseVariants ++
      (for (t <- txtCaseVariants; g <- Seq("gz", "GZ", "Gz", "gZ"))
        yield s"$t.$g"))
      .mkString("*.{", ",", "}")
    spark.read
      .format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path").as("file_path"), decodeUdf(col("content")).as("d"))
      .select(col("file_path"), col("d._1").as("text"), col("d._2").as("encoding"))
      .dropDuplicates("file_path")
  }

  /** Load a corpus directory: one row per .txt file with its path. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readWithEncoding(spark, dir).select("file_path", "text")

  /** The preview projection (UI affordance, per-row limit semantics). */
  def preview(df: DataFrame): DataFrame =
    df.select(
      col("file_path"),
      when(length(col("text")) > PreviewCharLimit,
        concat(substring(col("text"), 1, PreviewCharLimit),
          lit(PreviewTruncationMarker)))
        .otherwise(col("text")).as("preview"),
      (length(col("text")) > PreviewCharLimit).as("truncated")
    )

  val PreviewBatchSize = 20 // reference src/CorpusAid.py:159
  val MaxDisplayFiles = 5000 // reference src/CorpusAid.py:160

  /** Batch paging over the preview projection (reference UI paging,
    * src/CorpusAid.py:159-163): deterministic path order, 0-based `page` of
    * PREVIEW_BATCH_SIZE rows, display capped at MAX_DISPLAY_FILES. The cap
    * turns the global sort into a TakeOrdered top-k, and the single-partition
    * row_number window runs over at most 5000 rows — bounded at any corpus
    * size. */
  def previewBatch(df: DataFrame, page: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("file_path")
    preview(df.orderBy("file_path").limit(MaxDisplayFiles))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > page * PreviewBatchSize &&
        col("rn") <= (page + 1) * PreviewBatchSize)
      .drop("rn")
  }

  /** Remove documents by path set / clear (reference FileManager
    * remove_files/clear, src/CorpusAid.py:807-816). */
  def remove(df: DataFrame, paths: Seq[String]): DataFrame =
    df.filter(!col("file_path").isin(paths: _*))

  /** Sink: the reference overwrites source files keeping one `.bak`
    * (src/CorpusAid.py:2383-2418). The Spark-native contract is a versioned
    * columnar sink — partitioned parquet per run directory; the previous run
    * directory IS the backup (cheap rename-level "undo", like an Iceberg
    * snapshot). Only-modified-docs ≙ checkpointed resume (CheckpointedRun).
    */
  def write(df: DataFrame, outDir: String, runId: String): String = {
    val dest = s"$outDir/run=$runId"
    df.write.mode("overwrite").parquet(dest)
    dest
  }
}
