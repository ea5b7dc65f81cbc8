package graft.dedup

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Incremental (per-crawl-increment) dedup at corpus scale: keep only
  * new-batch rows whose content hash is absent from the existing corpus.
  *
  * The plain formulation (q49) is a hash-only left-anti join — correct, but
  * it shuffles |existing| + |batch| hashes every increment. At 100 TB the
  * existing corpus is ~10^11 hashes per increment, exchanged just to
  * reject mostly-new rows. This operator adds the standard scale lever:
  *
  *   1. the existing corpus' hashes are folded into a BLOOM FILTER
  *      (`DataFrameStatFunctions.bloomFilter` — built distributed, bits
  *      OR-merged, order-independent ⇒ deterministic) and broadcast;
  *   2. the new batch is prefiltered MAP-SIDE: Bloom has NO false
  *      negatives, so a miss is definitely new and passes with zero
  *      shuffle;
  *   3. only possible-duplicate rows (a `fpp` fraction of the batch plus
  *      the true duplicates) go through the exact anti-join, which removes
  *      the false positives.
  *
  * Net: result is EXACTLY the plain anti-join (no approximation leaks into
  * the output), while every exchange carries `(dup_rate + fpp)·|batch|`
  * hashes — the existing corpus is probed MAP-SIDE (broadcast of the
  * possible-dup hash set) and never shuffles, which the plan audit asserts
  * via runtime shuffle-byte accounting. The existing side is still
  * scanned once to build the filter — but a production pipeline persists
  * the filter alongside the corpus snapshot and only merges the
  * increment's bits, so steady-state cost is O(batch) plus one pruned
  * probe scan.
  */
object Incremental {

  /** The Bloom probe is `mightContainLong` over a primitive-Long UDF: a
    * non-bigint hash column (e.g. a hex-string hash, which [[buildFilter]]
    * happily accepts) would be implicitly cast to null and silently dropped
    * from BOTH filter branches. Fail fast instead. */
  private def requireLongHash(df: DataFrame, hashCol: String, side: String): Unit = {
    val dt = df.schema(hashCol).dataType
    require(dt == org.apache.spark.sql.types.LongType,
      s"$side hash column '$hashCol' must be BIGINT (xxhash64-style), got $dt")
  }

  /** Rows of `batch` whose `hash` value does not occur in `existing`'s
    * `hash` column. Exact (Bloom is only a prefilter).
    *
    * @param expectedItems sizing for the Bloom filter (#distinct existing
    *                      hashes); pass the known corpus cardinality
    * @param fpp           false-positive rate — the fraction of genuinely
    *                      new rows that pay the exact-verify exchange
    */
  def newRows(
      spark: SparkSession,
      batch: DataFrame,
      existing: DataFrame,
      hashCol: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp in (0,1), got $fpp")
    // validate BOTH sides before the Bloom build: a bad batch column
    // rejected only inside newRowsWithFilter would waste the full
    // existing-corpus scan that buildFilter runs first
    requireLongHash(batch, hashCol, "batch")
    requireLongHash(existing, hashCol, "existing")
    val bf = buildFilter(existing, hashCol, expectedItems, fpp)
    newRowsWithFilter(spark, batch, existing, hashCol, bf)
  }

  /** Distributed Bloom build over `existing`'s hash column (deterministic —
    * filter bits OR-merge order-independently). */
  def buildFilter(
      existing: DataFrame,
      hashCol: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): BloomFilter =
    existing.stat.bloomFilter(hashCol, math.max(1L, expectedItems), fpp)

  /** [[newRows]] with a PREBUILT filter — the steady-state shape: a
    * production pipeline persists the filter next to the corpus snapshot
    * ([[writeFilter]]/[[readFilter]]) and folds each committed increment's
    * bits in with `mergeInPlace` — the increment's filter MUST be built
    * with the same (expectedItems, fpp) sizing, or Spark refuses the
    * merge ("different bit size"); size for the corpus' target
    * cardinality from day one. No per-increment pass over the existing
    * corpus is needed to maintain it. (The exact verify join still
    * references `existing`, but only possible-duplicate batch rows probe
    * it — on a bucketed corpus table that is a pruned lookup, not a scan.)
    */
  def newRowsWithFilter(
      spark: SparkSession,
      batch: DataFrame,
      existing: DataFrame,
      hashCol: String,
      bf: BloomFilter,
      maxBroadcastBytes: Long = 64L << 20
  ): DataFrame = {
    requireLongHash(batch, hashCol, "batch")
    requireLongHash(existing, hashCol, "existing")
    val bfB = spark.sparkContext.broadcast(bf)
    val might = udf((h: Long) => bfB.value.mightContainLong(h))

    // null hashes: a null key never matches in the anti-join, so the plain
    // formulation KEEPS such rows — route them straight to definitely-new
    // (the primitive-input UDF would otherwise return null and the row
    // would silently land in neither branch)
    val definitelyNew =
      batch.filter(col(hashCol).isNull || !might(col(hashCol)))
    val possible = batch
      .filter(col(hashCol).isNotNull && might(col(hashCol)))
      .localCheckpoint(true) // read 2-3 times below; also sizes the strategy
    // ~16 B per possible-dup hash in a broadcast relation
    val broadcastable = possible.count() * 16 <= maxBroadcastBytes
    val confirmedNew =
      if (broadcastable) {
        // EXISTING NEVER SHUFFLES (the whole point at corpus scale): probe
        // it map-side with the broadcast possible-dup hash set, then
        // anti-join the (tiny, ≤ |possible|-distinct) hit set back. The
        // only exchanges in the verify carry possible-dup hashes.
        val hits = existing
          .join(broadcast(possible.select(hashCol).distinct()),
            Seq(hashCol), "left_semi")
          .select(hashCol).distinct()
        possible.join(broadcast(hits), Seq(hashCol), "left_anti")
      } else {
        // a mostly-duplicate increment (possible set too big to broadcast)
        // falls back to the shuffled anti-join — at that point the batch
        // side dominates the exchange anyway
        possible.join(
          existing.select(col(hashCol)).distinct(), Seq(hashCol), "left_anti")
      }
    // materialize, then release the (potentially corpus-sized) filter —
    // same broadcast lifecycle as MinHashLSH/NgramJaccard; without the
    // destroy, repeated increments stack one filter per call until driver
    // GC. The localCheckpoint costs O(new rows) executor storage; callers
    // streaming the result elsewhere can inline these two stages instead.
    val out = definitelyNew.unionByName(confirmedNew).localCheckpoint(true)
    possible.unpersist(false)
    bfB.destroy()
    out
  }

  // -- filter persistence (Hadoop FS: file:// locally, s3a/abfs in prod) --

  def writeFilter(
      bf: BloomFilter,
      path: String,
      conf: Configuration = new Configuration()): Unit = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try bf.writeTo(out)
    finally out.close()
  }

  def readFilter(
      path: String,
      conf: Configuration = new Configuration()): BloomFilter = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try BloomFilter.readFrom(in)
    finally in.close()
  }
}
