package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-scaled DOMAIN-MIXTURE weights — the "how much of each
  * source goes into the training mix" step that sits between cleaning
  * (keep/drop) and the epoch writer. Exponent-alpha sampling as used for
  * multilingual/multi-domain corpora (w_g ∝ mass_g^alpha): alpha = 1
  * reproduces natural proportions, alpha = 0 is uniform, intermediate
  * values up-sample small domains without letting a giant crawl source
  * drown everything.
  *
  * Shape: one map-side-combined aggregate to |groups| rows, one scalar
  * (the normalizer) to the driver — nothing about the corpus size ever
  * leaves the executors, so the op is identical at 100 TB.
  */
object Mixture {

  /** Per-group mixing weights over `mass` (tokens, chars, bytes…):
    * columns (group, n_docs, mass, weight) with weight = mass^alpha
    * normalized to sum 1, rounded to 6 dp (absorbs summation-order ulps).
    */
  def weights(
      df: DataFrame,
      group: Column,
      mass: Column,
      alpha: Double = 0.5
  ): DataFrame = {
    // materialized: the normalizer .head() below and the caller's action
    // would otherwise each re-run the FULL corpus aggregation (the
    // |groups|-row result is trivially small to pin)
    val g = df
      .groupBy(group.as("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(mass).cast("bigint").as("mass"))
      .localCheckpoint(true)
    // null on empty input (SQL sum over zero rows); 0 normalizer when
    // every mass is 0 — both would otherwise poison downstream ordering
    // (NPE / NaN weights in Interleave's sort key)
    val norm = Option(g
      .agg(sum(pow(col("mass").cast("double"), lit(alpha))))
      .head().getAs[java.lang.Double](0)).map(_.doubleValue).getOrElse(0.0)
    val w =
      if (norm > 0)
        round(pow(col("mass").cast("double"), lit(alpha)) / lit(norm), 6)
      else lit(0.0)
    g.withColumn("weight", w)
  }
}
