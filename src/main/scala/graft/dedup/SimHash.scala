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

  /** Near-dup pairs (id_a < id_b, hamming <= maxHamming). */
  def nearDuplicates(
      spark: SparkSession,
      docs: DataFrame, // columns: id, text
      cfg: Config = Config()
  ): DataFrame = {
    require(cfg.blocks > cfg.maxHamming, "need blocks > maxHamming for recall=1")
    import spark.implicits._

    val shUdf = udf((t: String) => if (t == null) 0L else simhash(t, cfg.seed))
    val sigs = docs.select(col("id"), shUdf(col("text")).as("sig")).cache()

    val width = 64 / cfg.blocks
    val blockUdf = udf((sig: Long) =>
      (0 until cfg.blocks).map(b => (b, (sig >>> (b * width)) & ((1L << width) - 1))))

    val buckets = sigs
      .select(col("id"), col("sig"), explode(blockUdf(col("sig"))).as("blk"))
      .groupBy(col("blk._1").as("block"), col("blk._2").as("value"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("members"))
      .filter(size(col("members")) > 1)
      .withColumn("members", slice(col("members"), 1, 256))

    val pairGen = udf { (members: Seq[org.apache.spark.sql.Row]) =>
      for {
        i <- members.indices
        j <- (i + 1) until members.length
        a = members(i); b = members(j)
        if hamming(a.getLong(1), b.getLong(1)) <= cfg.maxHamming
      } yield (a.getLong(0), b.getLong(0), hamming(a.getLong(1), b.getLong(1)))
    }

    buckets
      .select(explode(pairGen(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"), col("p._3").as("hamming"))
      .distinct()
  }
}
