package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Turn

/** JSONL transcript ingestion — the interchange format conversation/agent
  * logs actually arrive in (one JSON turn object per line) before they are
  * compacted into the bucketed table ([[graft.run.TranscriptTable]]).
  *
  * Contract mirrors the engine's never-fail ingest rules:
  *   - EXPLICIT schema (never `inferSchema` — a schema-inference pass over
  *     100 TB is a full extra scan, and drift would silently re-type
  *     columns mid-corpus)
  *   - PERMISSIVE parse with a `_corrupt_record` capture column: malformed
  *     lines land in a QUARANTINE DataFrame carrying the raw line + source
  *     file, they never kill the job and are never silently dropped (same
  *     error-side-channel contract as `QualityFilter.quarantineSplit`)
  *   - rows missing required keys (null conv_id/turn_idx/text after a
  *     successful parse) are quarantined too — a parse that "succeeds" by
  *     nulling half the row is still a bad record
  *   - timestamps parse as ISO-8601 instants; `ts` stays nullable (late
  *     enrichment may backfill)
  */
object JsonlTranscripts {

  /** Turn schema + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType),
    StructField("_corrupt_record", StringType)
  ))

  final case class Parsed(
      turns: Dataset[Turn],
      quarantine: DataFrame // (file, raw, reason)
  )

  /** Read a directory (or glob) of .jsonl files into typed turns plus a
    * quarantine of unparseable / key-incomplete lines. */
  def read(spark: SparkSession, path: String): Parsed = {
    import spark.implicits._
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // micro- AND milli-second fractions both parse (optional sections
      // backtrack); a logger emitting .SSSSSS must not cost the whole row
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS][XXX]")
      .json(path)
      .withColumn("__file", input_file_name())

    val incomplete =
      col("conv_id").isNull || col("turn_idx").isNull || col("text").isNull
    val corrupt = col("_corrupt_record").isNotNull

    val quarantine = raw
      .filter(corrupt || incomplete)
      .select(
        col("__file").as("file"),
        coalesce(col("_corrupt_record"),
          to_json(struct(col("conv_id"), col("turn_idx"), col("role"),
            col("text"), col("tool"), col("ts")))).as("raw"),
        when(corrupt, "malformed_json").otherwise("missing_required_key")
          .as("reason"))

    val turns = raw
      .filter(!corrupt && !incomplete)
      .select(
        col("conv_id"),
        col("turn_idx"),
        coalesce(col("role"), lit("")).as("role"),
        col("text"),
        coalesce(col("tool"), lit("")).as("tool"),
        // ts stays NULLABLE per the contract above: a fabricated epoch
        // sentinel is driver-timezone-dependent (Timestamp.valueOf parses
        // in the JVM default zone), masks "missing" from backfill, and a
        // watermarked streaming consumer would drop sentinel rows as
        // maximally late
        col("ts"))
      .as[Turn]

    Parsed(turns, quarantine)
  }

  /** JSONL export (interchange sink; the table sink is
    * [[graft.run.TranscriptTable]]). */
  def write(turns: Dataset[Turn], path: String): Unit =
    turns.write.mode("overwrite").json(path)
}
