package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Bounded-memory bucket capping for the LSH candidate paths.
  *
  * `groupBy(bucket).agg(collect_list(...))` materializes the ENTIRE bucket
  * in one aggregation buffer before any cap can run — a degenerate bucket
  * (millions of empty/boilerplate docs sharing a band hash) OOMs the
  * executor even though the pair loop would only ever read the first
  * `maxBucket` members. This helper drops the overflow BEFORE the
  * aggregation: a row_number window over the same keys the aggregation
  * groups by (same hash partitioning → no extra exchange) keeps the
  * `maxBucket` members with the LOWEST `orderCol` — the identical
  * deterministic selection the old post-collect `sort_array + take` made —
  * and the bucket's first row accumulator-counts the truncation so a
  * capped run never silently reads as complete (same audit contract as
  * before; task retries can overcount, which errs conservative).
  */
object BucketCap {

  /** `orderCol` must be UNIQUE within each bucket (all callers pass the
    * doc id): ties at the cap boundary would otherwise be broken by
    * arbitrary partition-internal order, making the kept set
    * retry-dependent. */
  def capped(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      maxBucket: Int,
      truncAcc: LongAccumulator,
      dropAcc: LongAccumulator
  ): DataFrame = {
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val wAll = Window.partitionBy(keys: _*) // frame = whole partition
    val mb = maxBucket
    val audit = udf { (rn: Int, bsz: Long) =>
      if (rn == 1 && bsz > mb) {
        truncAcc.add(1L)
        dropAcc.add(bsz - mb)
      }
      rn <= mb
    }.asNondeterministic()
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__bsz", count(lit(1)).over(wAll))
      .filter(audit(col("__rn"), col("__bsz")))
      .drop("__rn", "__bsz")
  }
}
