package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing primitive a
  * pretraining pipeline uses to up/down-weight strata (languages, sources,
  * quality tiers) when composing a training set.
  *
  * Gate: a row is kept iff the first 8 hex chars of `md5(key)` — a uniform
  * 32-bit draw any engine reproduces bit-exactly — sort below the stratum's
  * rate threshold. Properties that matter at 100 TB:
  *   - NARROW: a per-row filter, no shuffle, pushable below downstream ops
  *   - STATELESS-DETERMINISTIC: no RNG seed plumbing, same decision on
  *     retry/re-run/backfill (exactly-once safe in a resumable job), and
  *     the sample is a stable SUBSET as a stratum's rate grows (hash below
  *     0.25-threshold ⊂ hash below 0.5-threshold), so mixes can be re-tuned
  *     without churning previously selected rows
  *   - ENGINE-PORTABLE: lowercase fixed-width hex compares lexicographically
  *     the same everywhere (the DuckDB oracle replays the identical gate)
  */
object Stratified {

  /** Lexicographic hex threshold for a keep-rate in [0, 1]; rates >= 1 use
    * "g", which sorts above every hex digit (exact keep-all, no edge bias
    * at "ffffffff"). */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0, s"rate must be >= 0, got $rate")
    if (rate >= 1.0) "g"
    else f"${(rate * 4294967296d).toLong}%08x"
  }

  /** The 32-bit uniform draw as 8 lowercase hex chars. */
  def gate(key: Column): Column = substring(md5(key.cast("binary")), 1, 8)

  /** Keep-predicate for one stratum column against a rate map. Strata not
    * in the map use `defaultRate`. */
  def keepExpr(
      strata: Column,
      key: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): Column = {
    val thr = rates.foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(strata === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    // null-safe: md5(null) is null and a null comparison DROPS the row
    // regardless of rate — even a rate>=1.0 "keep everything" mix would
    // silently lose null-key rows. Treat a null key as the empty string
    // (deterministic, oracle-replayable).
    gate(coalesce(key, lit(""))) < thr
  }

  /** Filtered sample of `df`. */
  def sample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): DataFrame =
    df.filter(keepExpr(col(strataCol), col(keyCol), rates, defaultRate))

  /** Deterministic multi-way SPLIT (train/val/test): assigns each row the
    * label of the hash-range its 32-bit draw falls into — the same
    * [[gate]] machinery as rate sampling, so splits inherit its
    * properties: narrow per-row expression (no shuffle, no RNG state),
    * retry/re-run/backfill-stable, disjoint and exhaustive by
    * construction, and engine-portable (an ANSI CASE over the same md5
    * prefix replays it bit-exactly). Fractions are cumulative-thresholded;
    * the LAST split absorbs the remainder ("g" upper bound), so weights
    * that sum to 1 within rounding still cover every row.
    *
    * @param splits ordered (label, fraction) pairs; fractions in (0, 1],
    *               summing to ≤ 1 + ulp-slack (the last label takes the
    *               tail either way)
    */
  def splitExpr(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 > 0), s"fractions must be > 0: $splits")
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    require(cum.last <= 1.0 + 1e-9, s"fractions sum to ${cum.last} > 1")
    val g = gate(coalesce(key, lit(""))) // null keys split deterministically too
    val bounds = cum.init.map(thresholdHex) :+ "g" // last split takes the tail
    splits.map(_._1).zip(bounds).reverse.foldLeft(lit(null: String)) {
      case (acc, (label, hi)) => when(g < lit(hi), lit(label)).otherwise(acc)
    }
  }
}
