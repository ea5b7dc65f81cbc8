package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Turn

/** Streaming exact deduplication — the ingest-side dedup a continuous
  * pipeline runs before the batch near-dup passes.
  *
  * Mechanism: `dropDuplicatesWithinWatermark` on the 64-bit content hash.
  * State holds ONE compact row (hash + event time) per distinct text seen
  * inside the watermark horizon, and the watermark EXPIRES state — unlike
  * plain streaming `dropDuplicates`, whose state grows without bound over
  * an infinite stream. The horizon is the dedup contract: two identical
  * turns arriving within `horizon` of each other emit once; re-arrivals
  * beyond it re-emit (the batch near-dup layer owns cross-horizon dups).
  *
  * Scale shape: state is keyed by the hash, so the stateful operator's
  * shuffle carries (hash, ts) pairs — never text — and partitions uniformly
  * by construction (hash keys cannot skew). Text rides the row but is not
  * part of the dedup key. The key is 128-bit md5 — the same content-hash
  * contract as the batch-side exact dedup — because at billions of
  * in-horizon keys a 64-bit key has an expected birthday collision
  * (silently dropping a DISTINCT document); 128 bits keeps that probability
  * negligible (~1e-19 at 5e9 keys).
  */
object StreamingDedup {

  /** Distinct-within-horizon turns of a streaming Dataset[Turn]. */
  def apply(turns: Dataset[Turn], horizon: String = "10 minutes"): DataFrame =
    turns.toDF()
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
