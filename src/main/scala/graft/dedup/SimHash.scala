package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen.mix64

/** 64-bit SimHash near-duplicate detection with block-rotation candidate
  * generation (Charikar fingerprints; the Manku/Jain/Sarma WWW'07 blocking
  * scheme): split the fingerprint into `blocks` segments; near-dups within
  * Hamming distance < blocks must share at least one exact block, so the
  * candidate join groups on (blockIdx, blockValue) — a single shuffle, no
  * O(n²) comparison. */
object SimHash {

  final case class Config(
      maxHamming: Int = 3,
      blocks: Int = 4, // must be > maxHamming
      seed: Long = 11L
  )

  /** Weighted 64-bit simhash over word unigrams + bigrams of the canonical
    * text. */
  def simhash(text: String, seed: Long = 11L): Long = {
    val words = Shingles.canonical(text).split(' ').filter(_.nonEmpty)
    if (words.isEmpty) return 0L
    val acc = new Array[Int](64)
    def add(h: Long, w: Int): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var i = 0
    while (i < words.length) {
      val h1 = mix64(seed ^ Shingles.hashRange(words(i), 0, words(i).length, seed))
      add(h1, 1)
      if (i + 1 < words.length) {
        val h2 = mix64(h1 ^ Shingles.hashRange(words(i + 1), 0, words(i + 1).length, seed))
        add(h2, 1)
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Near-dup pairs (id_a < id_b, hamming <= maxHamming).
    *
    * Scale shape: the block exchange carries (block, value, id, sig) only —
    * 4 compact rows per doc, never text. A pair is emitted exactly once, in
    * the FIRST block where the two fingerprints agree (near-dups share up to
    * `blocks` blocks; without first-collision dedup the pair stream is ~4×
    * larger and needs a distinct() shuffle). Hot buckets are capped with
    * accumulator-counted, logged truncation — never silent. */
  def nearDuplicates(
      spark: SparkSession,
      docs: DataFrame, // columns: id, text
      cfg: Config = Config(),
      maxBucket: Int = 256
  ): DataFrame = {
    require(cfg.blocks > cfg.maxHamming, "need blocks > maxHamming for recall=1")
    import spark.implicits._
    val sc = spark.sparkContext
    val truncAcc = sc.longAccumulator("simhash.truncated_buckets")
    val dropAcc = sc.longAccumulator("simhash.dropped_ids")

    val shUdf = udf((t: String) => if (t == null) 0L else simhash(t, cfg.seed))
    val sigs = docs.select(col("id"), shUdf(col("text")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val width = 64 / cfg.blocks
    val nBlocks = cfg.blocks
    val maxH = cfg.maxHamming
    val mb = maxBucket
    // width == 64 (blocks = 1): (1L << 64) is 1 under Java's shift-mod-64,
    // so the naive mask would be 0 and every doc would share one bucket
    val mask = if (width >= 64) -1L else (1L << width) - 1
    def blockOf(sig: Long, b: Int): Long = (sig >>> (b * width)) & mask
    val blockUdf = udf((sig: Long) =>
      (0 until nBlocks).map(b => (b, blockOf(sig, b))))

    val exploded = sigs
      .select(col("id"), col("sig"), explode(blockUdf(col("sig"))).as("blk"))
      .select(col("id"), col("sig"),
        col("blk._1").as("block"), col("blk._2").as("value"))
    // cap BEFORE collect_list (bounded aggregation memory; see BucketCap)
    val pairs = BucketCap
      .capped(exploded, Seq("block", "value"), "id", mb, truncAcc, dropAcc)
      .groupBy(col("block"), col("value"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("members"))
      .filter(size(col("members")) > 1)
      .select(col("block"), col("members"))
      .as[(Int, Array[(Long, Long)])]
      .flatMap { case (block, members) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        var i = 0
        while (i < members.length) {
          val (idI, sI) = members(i)
          var j = i + 1
          while (j < members.length) {
            val (idJ, sJ) = members(j)
            val h = hamming(sI, sJ)
            if (h <= maxH) {
              // first block in which the two fingerprints agree
              var fb = 0
              while (blockOf(sI, fb) != blockOf(sJ, fb)) fb += 1
              if (fb == block) out += ((idI, idJ, h))
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("id_a", "id_b", "hamming")

    val out = pairs.localCheckpoint(true)
    sigs.unpersist(false)
    if (truncAcc.value > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"simhash: capped ${truncAcc.value} hot buckets at $mb ids " +
          s"(${dropAcc.value} memberships dropped) — recall loss is NOT " +
          "confined to capped buckets: a pair whose FIRST-agreeing block " +
          "was capped is suppressed in later blocks too (first-collision " +
          "dedup), so treat the counts as a lower bound on the loss")
    out
  }
}
