package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** MinHash + banded LSH near-duplicate detection
  * (shingle → minhash → band → bucket-join → exact-Jaccard verify).
  *
  * Scale path: the only shuffle is the groupBy on (band, bandHash); candidate
  * pairs are generated inside each bucket, buckets are CAPPED (a degenerate
  * bucket of B docs would emit B² pairs — we keep the first `maxBucket` by
  * doc id and log the drop), pairs are deduped by (a,b) before the verify
  * join. Verification re-shingles the pair's two texts from a broadcast-free
  * self-join on doc_id — exact Jaccard, no false positives survive.
  */
object MinHashLSH {

  /** numHashes = bands * rowsPerBand. Defaults: 16 bands × 8 rows — detects
    * Jaccard ≳ (1/16)^(1/8) ≈ 0.71 with high probability. */
  final case class Config(
      bands: Int = 16,
      rowsPerBand: Int = 8,
      shingleK: Int = 5,
      minJaccard: Double = 0.8,
      maxBucket: Int = 64,
      seed: Long = 7L
  ) {
    def numHashes: Int = bands * rowsPerBand
  }

  /** MinHash signature of a (sorted, distinct) shingle hash array: one
    * xor-seeded splitmix64 "permutation" per slot. */
  def signature(shingles: Array[Long], cfg: Config): Array[Long] = {
    val sig = Array.fill(cfg.numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val sh = shingles(i)
      var j = 0
      while (j < sig.length) {
        val h = mix64(sh ^ mix64(cfg.seed + j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** One hash per band over the signature slice. */
  def bandHashes(sig: Array[Long], cfg: Config): Array[Long] = {
    val out = new Array[Long](cfg.bands)
    var b = 0
    while (b < cfg.bands) {
      var h = cfg.seed ^ b
      var r = b * cfg.rowsPerBand
      val end = r + cfg.rowsPerBand
      while (r < end) { h = mix64(h ^ sig(r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Candidate-pair generation + exact verify.
    *
    * Input: (id, text). Output: (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= cfg.minJaccard, distinct.
    */
  def nearDuplicates(
      spark: SparkSession,
      docs: DataFrame, // columns: id (long), text (string)
      cfg: Config = Config()
  ): DataFrame = {
    import spark.implicits._

    val shingleUdf = udf((text: String) =>
      if (text == null) Array.empty[Long] else Shingles.charShingles(text, cfg.shingleK))
    val bandsUdf = udf((sh: Array[Long]) => bandHashes(signature(sh, cfg), cfg))

    // persisted: referenced three times (bucketing + both sides of the
    // verify join) — without this the upstream source AND the 128-slot
    // signatures are recomputed per reference
    val withBands = docs
      .select(col("id"), col("text"), shingleUdf(col("text")).as("shingles"))
      .withColumn("band_hashes", bandsUdf(col("shingles")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // explode to (band_idx, band_hash, id); shuffle on the bucket key
    val buckets = withBands
      .select(col("id"), posexplode(col("band_hashes")).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // cap degenerate buckets — at web scale a hot bucket would emit B² pairs
      .withColumn("ids", slice(col("ids"), 1, cfg.maxBucket))

    val pairGen = udf { (ids: Seq[Long]) =>
      for { i <- ids.indices; j <- (i + 1) until ids.length }
        yield (ids(i), ids(j))
    }
    val pairs = buckets
      .select(explode(pairGen(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()

    // exact verify: join shingle sets back (two semi-broadcastable joins)
    val sh = withBands.select(col("id"), col("shingles"))
    val jac = udf((a: Array[Long], b: Array[Long]) => Shingles.jaccard(a, b))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("jaccard", jac(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= cfg.minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Brute-force O(n²) oracle for tests — driver-side, small n only. */
  def bruteForcePairs(
      docs: Seq[(Long, String)],
      cfg: Config = Config()
  ): Seq[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> Shingles.charShingles(t, cfg.shingleK) }
    for {
      i <- sh.indices
      j <- (i + 1) until sh.length
      jac = Shingles.jaccard(sh(i)._2, sh(j)._2)
      if jac >= cfg.minJaccard
    } yield {
      val (a, b) = if (sh(i)._1 < sh(j)._1) (sh(i)._1, sh(j)._1) else (sh(j)._1, sh(i)._1)
      (a, b, jac)
    }
  }
}
