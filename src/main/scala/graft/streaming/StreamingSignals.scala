package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.{Compressibility, LineFilters, Repetition}

/** Structured Streaming variant of the round-5 document quality gates —
  * C4 line filters, the Gopher repetition battery, and the zlib
  * compressibility band — for continuous ingestion. All three gates are
  * STATELESS per-document kernels (unlike [[StreamingFilter]]'s keyed
  * cross-turn state), so the same one-pass `mapPartitions` serves batch
  * and streaming inputs unchanged; the spec asserts batch == streaming
  * across micro-batch boundaries. Per-partition native Deflater reuse as
  * in the batch [[Compressibility]] pass.
  *
  * Output: (idCol, c4_keep, rep_keep, z_keep, final_keep) — final_keep
  * is the conjunction (the q83 manifest's gate half; the corpus-level
  * stages — perplexity terciles, DSIR selection — are inherently batch
  * and stay in the batch manifest).
  */
object StreamingSignals {

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
        val d = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](65536)
        it.map { case (id, text) =>
          val t = if (text == null) "" else text
          val c4 = LineFilters.filter(t).docKeep
          val rep = Repetition.keep(Repetition.signals(t))
          val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val zk = Compressibility.keep(
            b.length.toLong, Compressibility.zlenWith(d, buf, b))
          (id, c4, rep, zk, c4 && rep && zk)
        }
      }
      .toDF(idCol, "c4_keep", "rep_keep", "z_keep", "final_keep")
  }
}
