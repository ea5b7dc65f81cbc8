package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: interval × point non-equi join that Spark would
  * otherwise plan as a broadcast-nested-loop (or a full cartesian +
  * filter) — quadratic and undistributable at scale.
  *
  * Banding turns it into an equi-join: every right point lands in exactly
  * ONE band of width `bandWidth`; every left interval [lo, hi] is exploded
  * to the bands it spans (`ceil(span / bandWidth) + 1` rows, a small
  * constant when bandWidth ≈ typical span). The equi-join on `band` then
  * co-partitions exactly the rows that can match, and the residual
  * `lo <= pt <= hi` filter runs post-join. Each qualifying (interval,
  * point) pair meets in exactly one band — the point's — so no
  * dedup/distinct pass is needed.
  *
  * Scale properties: shuffle volume is |points| + Σ spans/bandWidth rows
  * (choose bandWidth near the median span to keep the explosion factor
  * ~2×); a hot band (timestamp skew) is still a single shuffle key, so
  * AQE skew-join splitting applies to it — unlike a nested loop, which
  * cannot be split at all.
  *
  * Contract: `loCol`/`hiCol`/`ptCol` are integral (e.g. unix_micros),
  * |value| < 2^53 (band assignment goes through a double floor),
  * lo <= hi, and the two inputs share no column names.
  */
object RangeJoin {

  def pointsInRanges(
      intervals: DataFrame,
      points: DataFrame,
      loCol: String,
      hiCol: String,
      ptCol: String,
      bandWidth: Long,
      maxBandsPerInterval: Long = 1L << 20
  ): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def band(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(bandWidth.toDouble)).cast("long")
    // fail FAST and per-row on contract violations instead of letting one
    // corrupt interval kill the job obscurely: lo > hi would silently
    // produce a descending (empty-match) sequence, and an outlier span
    // would make explode(sequence(...)) build a multi-million-element
    // array per row (past ~2^31 Spark itself aborts). The guard lives in
    // a FILTER so Catalyst cannot prune it as an unused projection.
    val nBands = band(col(hiCol)) - band(col(loCol)) + lit(1L)
    val guarded = intervals.filter(
      when(col(loCol) > col(hiCol),
        raise_error(concat(
          lit(s"range_join: $loCol > $hiCol at lo="),
          col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string"))))
        .when(nBands > maxBandsPerInterval,
          raise_error(concat(
            lit("range_join: interval spans "), nBands.cast("string"),
            lit(s" bands > maxBandsPerInterval=$maxBandsPerInterval — " +
              "raise bandWidth or the cap"))))
        .otherwise(lit(true)))
    val banded = guarded.withColumn(
      "_band", explode(sequence(band(col(loCol)), band(col(hiCol)))))
    val pts = points.withColumn("_band", band(col(ptCol)))
    banded
      .join(pts, Seq("_band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_band")
  }
}
