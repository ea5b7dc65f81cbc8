package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact word-n-gram Jaccard similarity join with PREFIX FILTERING — the
  * third member of the near-dup family (exact-threshold complement to the
  * probabilistic MinHash LSH and SimHash paths).
  *
  * Semantics (kept deliberately ANSI-SQL-expressible so the result is
  * DuckDB-oracle-checkable, unlike the hash-sketch methods): tokens are
  * `trim(text).split("\\s+")`, grams are the n consecutive-token windows
  * joined with a single space, sets are DISTINCT grams, and
  * jaccard(a, b) = |a ∩ b| / |a ∪ b| computed exactly. Documents with
  * fewer than n tokens have no grams and never pair.
  *
  * Prefix filtering (SSJoin/PPJoin family, Chaudhuri ICDE'06 / Xiao
  * WWW'08): under ANY fixed global total order of grams (we use the 64-bit
  * gram hash, ascending — needs no frequency pass), two sets with
  * jaccard >= t must share at least one gram among each one's FIRST
  * `|s| - ceil(t * |s|) + 1` grams. So only those prefix grams are
  * exploded into the inverted index — the candidate shuffle carries
  * roughly half the gram volume at t = 0.5, and buckets pair only
  * documents that share a (rarely-shared-by-construction) prefix gram.
  *
  * Scale shape: one shuffle builds the inverted index on (gram hash), hot
  * grams are capped at `maxBucket` members with accumulator-counted
  * truncation (same audit contract as [[MinHashLSH]] — a capped run never
  * silently reads as complete), candidates are distinct-ed (a pair can
  * share several prefix grams), and the exact verify joins the two compact
  * sorted-hash arrays back by id — candidate volume, not corpus volume.
  */
object NgramJaccard {

  /** Distinct sorted 64-bit hashes of the word n-grams of `text`. */
  def gramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val trimmed = text.trim
    if (trimmed.isEmpty) return Array.empty
    val words = trimmed.split("\\s+")
    if (words.length < n) return Array.empty
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + n <= words.length) {
      var h = 0x6a09e667f3bcc909L
      var j = i
      while (j < i + n) {
        // mix a separator between words so ["ab","c"] and ["a","bc"]
        // hash differently despite equal concatenations
        if (j > i) h = graft.gen.TranscriptGen.mix64(h ^ ' ')
        h = Shingles.hashRange(words(j), 0, words(j).length, h)
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Sorted-merge verify with FIRST-SHARED-GRAM dedup: walks the two sorted
    * hash arrays once; the first common element found IS the pair's smallest
    * shared gram under the global order. If it differs from `bucketGram` the
    * pair belongs to another bucket (early exit — no duplicate work, no
    * `distinct()` shuffle); otherwise the same single pass completes the
    * exact intersection count.
    *
    * Why exactly-once is lossless: if jaccard(a,b) >= tau then the overlap
    * o satisfies o >= tau*(|a|+|b|)/(1+tau) >= ceil(tau*|a|) (using
    * |b| >= tau*|a|, implied by the threshold), and the smallest shared
    * gram ranks before at least o-1 others of a, i.e. within a's first
    * |a|-o+1 <= |a|-ceil(tau*|a|)+1 positions — the indexed prefix. Same
    * for b. So every qualifying pair meets in the bucket of its smallest
    * shared gram, and only that bucket emits it. */
  private[dedup] def verifyAtFirstShared(
      a: Array[Long], b: Array[Long], bucketGram: Long, tau: Double): Double = {
    var i = 0
    var j = 0
    var inter = 0
    var first = true
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) {
        if (first) {
          if (a(i) != bucketGram) return -1.0 // another bucket owns this pair
          first = false
        }
        inter += 1; i += 1; j += 1
      } else if (a(i) < b(j)) i += 1
      else j += 1
    }
    if (first) return -1.0 // no shared gram at all
    val jac = inter.toDouble / (a.length + b.length - inter)
    if (jac >= tau) jac else -1.0
  }

  /** All pairs (id_a < id_b, jaccard >= tau) over (id, text) documents.
    *
    * Adaptive verify strategy (same contract as [[MinHashLSH]]): when the
    * corpus' gram arrays fit the broadcast budget, verification runs
    * MAP-SIDE inside the bucket flatMap against a broadcast id→grams store —
    * the only shuffle is the compact (gram, id) inverted index, there is no
    * candidate `distinct()` and no verify join, and first-shared-gram dedup
    * guarantees each qualifying pair is emitted exactly once. (On dense gram
    * spaces — small vocabularies — prefix filtering alone cannot prune: at
    * sf0.1 the 5,000-doc corpus has 931 distinct bigrams and ~3.5M distinct
    * candidate pairs; shuffling + joining those dominated the round-1
    * battery at 15 s. The broadcast path verifies them in-place for ~1 s.)
    * Above the budget, the index buckets carry (id, size) and the
    * length-filtered candidate pairs go through the distinct + compact
    * gram-array join — the shape a corpus of billions of docs takes.
    *
    * Bucket-cap interaction (documented loss, mirrors [[MinHashLSH]]): when
    * a hot gram's bucket is truncated at `maxBucket`, the broadcast path
    * loses pairs whose SMALLEST shared gram was the truncated one (no other
    * bucket owns them), while the shuffle path may still recover such a
    * pair through a different shared prefix gram — so under truncation the
    * shuffle path's result is a (weak) superset. Truncation is never
    * silent: both paths count it through the same accumulators, and a run
    * with zero truncated buckets is exact and identical across paths. */
  def similarPairs(
      spark: SparkSession,
      docs: DataFrame, // columns: id (long), text (string)
      n: Int = 2,
      tau: Double = 0.5,
      maxBucket: Int = 256,
      maxBroadcastBytes: Long = 256L << 20
  ): DataFrame = {
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    // n <= 0 would degenerate every doc to the single seed-constant gram
    // hash (the n-window loop never runs) → an all-pairs jaccard=1 blowup
    require(n >= 1, s"n must be >= 1, got $n")
    import spark.implicits._
    val sc = spark.sparkContext
    val truncAcc = sc.longAccumulator("ngram_jaccard.truncated_buckets")
    val dropAcc = sc.longAccumulator("ngram_jaccard.dropped_ids")

    val gramsUdf = udf((t: String) => gramHashes(t, n))
    val sets = docs
      .select(col("id"), gramsUdf(col("text")).as("grams"))
      .filter(size(col("grams")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one stats job (materializes the cache): total gram volume → strategy
    // budget estimate charges 64 B/doc of map-entry + array-header overhead
    // on top of the raw longs — a many-small-docs corpus is
    // overhead-dominated and must not slip under the budget on payload
    // bytes alone
    val sRow = sets
      .agg(coalesce(sum(size(col("grams"))), lit(0L)), count(lit(1))).head()
    val gramBytes = sRow.getLong(0) * 8 + sRow.getLong(1) * 64
    val smallMode = gramBytes * 2 < maxBroadcastBytes

    // prefix length under the hash-ascending global order (grams is sorted)
    val prefix = slice(
      col("grams"), lit(1),
      (size(col("grams")) - ceil(size(col("grams")) * tau) + 1).cast("int"))

    val mb = maxBucket
    // tracked so the (up to maxBroadcastBytes) gram store can be destroyed
    // once the result is materialized — same lifecycle as MinHashLSH's
    // `bcasts`; without it repeated invocations pin executor memory until
    // driver GC happens to collect the handle
    var storeHandle: Option[org.apache.spark.broadcast.Broadcast[_]] = None
    val out = (if (smallMode) {
      val store = sc.broadcast(
        sets.as[(Long, Array[Long])].collect().toMap)
      storeHandle = Some(store)
      sets
        .select(col("id"), explode(prefix).as("gram"))
        .groupBy("gram")
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(col("gram"), col("ids"))
        // bucket rows are tiny (a few KB) but their pair loops are the CPU
        // hot spot — AQE byte-coalescing would fold them into 1-2 tasks, so
        // spread them across the cluster explicitly (shuffles ~nothing)
        .repartition(sc.defaultParallelism)
        .as[(Long, Array[Long])]
        .flatMap { case (gram, ids0) =>
          val st = store.value
          val ids =
            if (ids0.length > mb) {
              truncAcc.add(1L)
              dropAcc.add((ids0.length - mb).toLong)
              ids0.take(mb)
            } else ids0
          val outBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var i = 0
          while (i < ids.length) {
            val ga = st(ids(i))
            var j = i + 1
            while (j < ids.length) {
              val gb = st(ids(j))
              // length filter: |a|*tau <= |b| and |b|*tau <= |a|
              if (ga.length * tau <= gb.length && gb.length * tau <= ga.length) {
                val jac = verifyAtFirstShared(ga, gb, gram, tau)
                if (jac >= 0) outBuf += ((ids(i), ids(j), jac))
              }
              j += 1
            }
            i += 1
          }
          outBuf
        }
        .toDF("id_a", "id_b", "jaccard")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    } else {
      // shuffle path: buckets carry (id, size) for the length filter, the
      // (much smaller) surviving candidate set dedups + joins gram arrays
      val candidates = sets
        .select(col("id"), size(col("grams")).as("sz"), explode(prefix).as("gram"))
        .groupBy("gram")
        .agg(sort_array(collect_list(struct(col("id"), col("sz")))).as("members"))
        .filter(size(col("members")) > 1)
        .select(col("members"))
        .repartition(sc.defaultParallelism) // spread pair loops (see above)
        .as[Array[(Long, Int)]]
        .flatMap { members0 =>
          val members =
            if (members0.length > mb) {
              truncAcc.add(1L)
              dropAcc.add((members0.length - mb).toLong)
              members0.take(mb)
            } else members0
          for {
            i <- members.indices.iterator
            j <- (i + 1) until members.length
            if members(i)._2 * tau <= members(j)._2 &&
              members(j)._2 * tau <= members(i)._2
          } yield (members(i)._1, members(j)._1)
        }
        .toDF("id_a", "id_b")
        .distinct()
      val jacUdf = udf((a: Array[Long], b: Array[Long]) => Shingles.jaccard(a, b))
      candidates
        .join(sets.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
        .withColumn("jaccard", jacUdf(col("g_a"), col("g_b")))
        .filter(col("jaccard") >= tau)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }).localCheckpoint(true)
    sets.unpersist(false)
    storeHandle.foreach(_.destroy())
    if (truncAcc.value > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ngram_jaccard: capped ${truncAcc.value} hot gram buckets at $mb ids " +
          s"(${dropAcc.value} memberships dropped) — similarity recall is not " +
          "exhaustive for those grams")
    out
  }

  /** Brute-force O(n²) oracle for tests — driver-side, STRING sets (catches
    * any hash-collision drift between gramHashes and true gram sets). */
  def bruteForcePairs(
      docs: Seq[(Long, String)],
      n: Int = 2,
      tau: Double = 0.5
  ): Seq[(Long, Long, Double)] = {
    def strGrams(t: String): Set[String] = {
      if (t == null) return Set.empty
      val w = t.trim.split("\\s+").toIndexedSeq
      if (t.trim.isEmpty || w.length < n) Set.empty
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> strGrams(t) }.filter(_._2.nonEmpty)
    for {
      i <- sets.indices
      j <- (i + 1) until sets.length
      inter = (sets(i)._2 & sets(j)._2).size
      jac = inter.toDouble / (sets(i)._2.size + sets(j)._2.size - inter)
      if jac >= tau
    } yield {
      val (a, b) =
        if (sets(i)._1 < sets(j)._1) (sets(i)._1, sets(j)._1)
        else (sets(j)._1, sets(i)._1)
      (a, b, jac)
    }
  }
}
