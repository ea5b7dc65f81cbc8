package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.gen.TranscriptGen.mix64

/** MinHash + banded LSH near-duplicate detection
  * (shingle → one-permutation minhash → band → bucket-join → signature
  * prefilter → exact-Jaccard verify).
  *
  * Signature: ONE-PERMUTATION HASHING (OPH) with rotation densification
  * (Li/Owen/Zhang NIPS'12 one-permutation scheme; Shrivastava & Li ICML'14
  * densification) — each shingle is hashed ONCE and routed to bin
  * `hash mod numHashes`, keeping the per-bin minimum; empty bins borrow the
  * nearest non-empty bin to the right (circularly), mixed with the borrow
  * distance so unrelated documents do not collide on the borrowed value.
  * Cost is O(shingles + numHashes) per document instead of the classic
  * O(shingles × numHashes) — at 128 slots that is ~100× less signature CPU,
  * which was the measured hot loop of the whole round-1 query battery.
  *
  * Candidate generation: bucket members carry their full band-hash array, so
  * a pair is emitted ONLY from the first band in which the two documents
  * collide. Dense near-dup clusters collide in all `bands` bands — without
  * this, the pair stream is ~bands× larger and needs a full `distinct()`
  * shuffle to dedup (measured: 22M raw vs 1.4M unique pairs at sf0.1).
  *
  * Scale path (the 100-TB story):
  *   - the bucket shuffle carries (band, bandHash, id, bandHashes[bands])
  *     only — never text, shingles, or signatures
  *   - degenerate buckets (boilerplate shingles) are CAPPED at `maxBucket`
  *     ids; truncation is COUNTED via accumulators and logged + surfaced
  *     through [[LshStats]] so a capped run never silently reads as complete
  *   - candidate pairs are prefiltered by SIGNATURE agreement and then
  *     exact-verified by re-shingling the two texts; when the doc count is
  *     small enough (cfg.maxBroadcastBytes) both lookups run map-side from
  *     broadcast hash maps — zero extra shuffles; above the threshold the
  *     prefilter uses a SAMPLED 16-slot sub-signature (8× lighter than the
  *     full signature, threshold re-derived for 16-slot variance), run
  *     map-side from a broadcast sample table while THAT still fits the
  *     budget (30× smaller than full state) and as a compact pair join
  *     beyond; text joins only for the survivor set — never the 10-100×
  *     larger shingle sets
  *   - the intermediate caches are UNPERSISTED before returning; the result
  *     is eagerly materialized via localCheckpoint so callers get a small,
  *     lineage-free pair table
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
      seed: Long = 7L,
      maxBroadcastBytes: Long = 256L << 20
  ) {
    def numHashes: Int = bands * rowsPerBand

    /** Signature-estimate prefilter threshold: minJaccard minus ~4.5σ of the
      * numHashes-slot matching-fraction estimator — keeps the prefilter's
      * false-drop probability per true pair below ~1e-4. */
    def estThreshold: Double = estThresholdFor(numHashes)

    /** Same bound for a prefilter over only the first `slots` signature
      * slots (the large-mode SAMPLED prefilter — wider σ, lower cut). */
    def estThresholdFor(slots: Int): Double = {
      val sigma = math.sqrt(minJaccard * (1 - minJaccard) / slots)
      math.max(0.0, minJaccard - 4.5 * sigma)
    }

    /** Sampled-prefilter width: enough slots to reject unrelated pairs
      * (agreement ≈ 0) while shipping 1/8 of the signature bytes. */
    def sampleSlots: Int = math.min(16, numHashes)

    /** Sketch-state bytes (sig + bands + overhead) for n docs — the term
      * the small-mode gate tests against maxBroadcastBytes. The 32-long
      * overhead term prices the REAL JVM cost of the two broadcast
      * Map[Long, _] structures (boxed keys + HAMT nodes + array headers,
      * ~128 B per entry per map), not just the payload — an optimistic
      * 2-long estimate admitted corpora ~1.5-2× over budget. */
    def stateBytes(nDocs: Long): Long = nDocs * (numHashes + bands + 32) * 8

    /** A budget that fails the small-mode gate but admits the 16-slot
      * sample table — the MID tier (map-side sampled prefilter). Exists so
      * tests/harnesses that steer into that branch stay in lockstep with
      * the internal sizing. */
    def midTierBudget(nDocs: Long): Long = stateBytes(nDocs) / 2
  }

  /** Bucket-cap truncation telemetry for one [[nearDuplicates]] invocation.
    * Accumulator-backed: read after the result has been materialized. */
  final case class LshStats(
      truncatedBuckets: org.apache.spark.util.LongAccumulator,
      droppedIds: org.apache.spark.util.LongAccumulator
  )

  /** Broadcast-side doc store for the small-corpus path: texts + band
    * hashes, with a per-executor lazily-memoized shingle cache (each doc's
    * shingle set is computed at most once per JVM, so exact verify is a
    * sorted-array merge instead of a re-shingling per pair). */
  final class DocStore(
      val texts: scala.collection.Map[Long, String],
      val bands: scala.collection.Map[Long, Array[Long]],
      k: Int
  ) extends Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Long]]()
    @transient private lazy val memoLongs =
      new java.util.concurrent.atomic.AtomicLong(0L)
    def shingles(id: Long): Array[Long] = {
      val cached = memo.get(id)
      if (cached != null) return cached
      val t = texts(id)
      val sh = if (t == null) Array.empty[Long]
        else Shingles.charShingles(t, k)
      // BOUNDED memo: shingle arrays cost ~8 bytes per source character —
      // an uncapped cache could grow to ~8× the text bytes the broadcast
      // gate admitted. Past the cap, compute-without-caching: correctness
      // unchanged, verify degrades to re-shingling the coldest docs.
      if (memoLongs.addAndGet(sh.length) <= DocStore.MaxMemoLongs) {
        if (memo.putIfAbsent(id, sh) != null) // lost the race: refund
          memoLongs.addAndGet(-sh.length)
      } else memoLongs.addAndGet(-sh.length)
      sh
    }
  }

  object DocStore {
    /** Per-executor shingle-cache budget: 16M longs ≈ 128 MB. */
    val MaxMemoLongs: Long = 16L << 20
  }

  /** One-permutation MinHash signature of a (distinct) shingle hash array:
    * one mix64 per shingle routed to bin (h >>> 1) % numHashes, min per bin,
    * then rotation densification for empty bins. An all-empty input (empty
    * document) keeps the Long.MaxValue sentinel in every slot, so empty docs
    * still collide with each other (Jaccard(∅,∅) = 1 by convention). */
  def signature(shingles: Array[Long], cfg: Config): Array[Long] = {
    val n = cfg.numHashes
    val sig = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = mix64(shingles(i) ^ mix64(cfg.seed))
      val bin = ((h >>> 1) % n).toInt
      if (h < sig(bin)) sig(bin) = h
      i += 1
    }
    if (shingles.length == 0) return sig
    // rotation densification: empty bin <- nearest non-empty bin to the
    // right (circular), mixed with the distance so different borrow
    // distances never alias
    var anyEmpty = false
    i = 0
    while (i < n && !anyEmpty) { anyEmpty = sig(i) == Long.MaxValue; i += 1 }
    if (anyEmpty) {
      val dense = new Array[Long](n)
      i = 0
      while (i < n) {
        if (sig(i) != Long.MaxValue) dense(i) = sig(i)
        else {
          var d = 1
          while (sig((i + d) % n) == Long.MaxValue) d += 1
          dense(i) = mix64(sig((i + d) % n) ^ (d.toLong * 0xdeadbeefL))
        }
        i += 1
      }
      return dense
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

  /** Fraction of agreeing signature slots — the MinHash Jaccard estimate. */
  def sigAgreement(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Candidate-pair generation + exact verify.
    *
    * Input: (id, text). Output: (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= cfg.minJaccard, distinct. The returned DataFrame is eagerly
    * materialized (localCheckpoint) so intermediate caches are released
    * before returning.
    */
  def nearDuplicates(
      spark: SparkSession,
      docs: DataFrame, // columns: id (long), text (string)
      cfg: Config = Config()
  ): DataFrame = nearDuplicatesWithStats(spark, docs, cfg)._1

  def nearDuplicatesWithStats(
      spark: SparkSession,
      docs: DataFrame,
      cfg: Config = Config()
  ): (DataFrame, LshStats) = {
    import spark.implicits._
    val sc = spark.sparkContext
    val stats = LshStats(
      sc.longAccumulator("minhash_lsh.truncated_buckets"),
      sc.longAccumulator("minhash_lsh.dropped_ids"))

    val sigUdf = udf((text: String) =>
      if (text == null) signature(Array.empty[Long], cfg)
      else signature(Shingles.charShingles(text, cfg.shingleK), cfg))
    val bandsUdf = udf((sig: Array[Long]) => bandHashes(sig, cfg))

    // ONE persisted per-doc state table (text + signature + band hashes);
    // the sketch columns are compact by design (numHashes + bands longs),
    // never the 10-100x larger shingle sets. Persisting here also means an
    // expensive upstream (generator, dedup shuffle, wide scan) runs once.
    val state = docs
      .select(col("id"), col("text"), sigUdf(col("text")).as("sig"))
      .withColumn("bands", bandsUdf(col("sig")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // one stats job (also materializes the cache)
    val sRow = state.agg(
      count(lit(1)), coalesce(sum(octet_length(col("text"))), lit(0L))).head()
    val nDocs = sRow.getLong(0)
    val sigBytes = cfg.stateBytes(nDocs)
    val textBytes = sRow.getLong(1)
    // adaptive small-side strategy: below the byte budget the prefilter and
    // verify lookups run map-side from broadcast hash maps (zero shuffles
    // after the bucket exchange); above it, the identical logic runs as
    // compact shuffle joins — the path a 100-TB corpus takes
    val smallMode =
      sigBytes < cfg.maxBroadcastBytes && textBytes * 2 < cfg.maxBroadcastBytes

    // Bucketing = the ONLY unavoidable wide shuffle. A pair is emitted
    // exactly once, in the FIRST band where the two docs collide — no
    // bands-times-larger pair stream, no distinct() shuffle.
    //
    // Cap interaction (documented loss): a pair dropped by the cap in its
    // first-colliding band is not re-emitted by a later band — the
    // truncation accumulators below are the audit trail for exactly that.
    val truncAcc = stats.truncatedBuckets
    val dropAcc = stats.droppedIds
    val maxBucket = cfg.maxBucket
    // broadcasts created below outlive their branch; destroyed after the
    // result is materialized (they otherwise pin executor memory for the
    // session lifetime — bench/stress loops invoke this repeatedly)
    val bcasts = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.broadcast.Broadcast[_]]

    val verified =
      if (smallMode) {
        // Small-corpus path: ONE collect over the cached state feeds a
        // broadcast DocStore (texts + band vectors + per-executor shingle
        // memo). The bucket shuffle then carries BARE IDS (8 bytes/row);
        // first-collision dedup resolves band vectors from the broadcast,
        // and exact verify is a memoized sorted-array Jaccard — each doc is
        // shingled at most once per executor, not once per pair.
        val rows = state.select(col("id"), col("text"), col("bands"))
          .as[(Long, String, Array[Long])].collect()
        val store = sc.broadcast(new DocStore(
          rows.iterator.map(r => r._1 -> r._2).toMap,
          rows.iterator.map(r => r._1 -> r._3).toMap,
          cfg.shingleK))
        bcasts += store
        val minJ = cfg.minJaccard
        // cap BEFORE collect_list (bounded aggregation memory; BucketCap)
        BucketCap
          .capped(
            state.select(col("id"), posexplode(col("bands")).as(Seq("band", "bh"))),
            Seq("band", "bh"), "id", maxBucket, truncAcc, dropAcc)
          .groupBy(col("band"), col("bh"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(col("band"), col("ids"))
          // bucket rows are tiny but their pair loops are the CPU hot spot —
          // AQE byte-coalescing would fold them into 1-2 tasks; spread them
          .repartition(sc.defaultParallelism)
          .as[(Int, Array[Long])]
          .flatMap { case (band, ids) =>
            val st = store.value
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var i = 0
            while (i < ids.length) {
              val bI = st.bands(ids(i))
              var j = i + 1
              while (j < ids.length) {
                val bJ = st.bands(ids(j))
                // first band in which the two members collide
                var fb = 0
                while (bI(fb) != bJ(fb)) fb += 1
                // exact verify for EVERY first-collision candidate — the
                // small path stays lossless (no probabilistic prefilter;
                // the memoized sorted-merge is cheap enough here, and the
                // sampled gate measurably bought nothing at bench scale)
                if (fb == band) {
                  val jac = Shingles.jaccard(st.shingles(ids(i)), st.shingles(ids(j)))
                  if (jac >= minJ) out += ((ids(i), ids(j), jac))
                }
                j += 1
              }
              i += 1
            }
            out
          }
          .toDF("id_a", "id_b", "jaccard")
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      } else {
        // 100-TB path. The prefilter works on a SAMPLED sub-signature (the
        // first sampleSlots=16 slots, threshold re-derived for the wider
        // 16-slot σ): unrelated bucket-mates agree on ≈0 slots, so 16 slots
        // reject them as surely as 128 while shipping 1/8 of the bytes —
        // profiled at 152k docs / 8M candidates, the full-signature join
        // moved ~16 GB and took 57 s of a 74 s run.
        //
        // Two sampled-prefilter placements, picked by a second budget test:
        // the sample table (nDocs × 16 longs — 30× smaller than text+sig
        // state) usually fits the broadcast budget long after full state
        // does not, and then the prefilter runs INSIDE the bucket flatMap
        // (candidates that fail it are never materialized at all). Past
        // that, the same filter runs as an 8×-lighter pair join.
        val sampleSlots = cfg.sampleSlots
        val estThr = cfg.estThresholdFor(sampleSlots)
        // +16 longs: honest Map-entry overhead (see Config.stateBytes)
        val sampleBytes = nDocs * (sampleSlots + 16) * 8
        val sampleBcast = sampleBytes < cfg.maxBroadcastBytes

        val samples = sc.broadcast(
          if (sampleBcast)
            state.select(col("id"), slice(col("sig"), 1, sampleSlots))
              .as[(Long, Array[Long])].collect().toMap
          else Map.empty[Long, Array[Long]])
        bcasts += samples

        val pairs = BucketCap
          .capped(
            state.select(col("id"), col("bands"),
              posexplode(col("bands")).as(Seq("band", "bh"))),
            Seq("band", "bh"), "id", maxBucket, truncAcc, dropAcc)
          .groupBy(col("band"), col("bh"))
          .agg(sort_array(collect_list(struct(col("id"), col("bands")))).as("members"))
          .filter(size(col("members")) > 1)
          .select(col("band"), col("members"))
          .repartition(sc.defaultParallelism) // spread pair loops (see above)
          .as[(Int, Array[(Long, Array[Long])])]
          .flatMap { case (band, members) =>
            val sm = samples.value
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            var i = 0
            while (i < members.length) {
              val (idI, bI) = members(i)
              var j = i + 1
              while (j < members.length) {
                val (idJ, bJ) = members(j)
                var fb = 0
                while (bI(fb) != bJ(fb)) fb += 1
                if (fb == band &&
                  (sm.isEmpty || sigAgreement(sm(idI), sm(idJ)) >= estThr))
                  out += ((idI, idJ))
                j += 1
              }
              i += 1
            }
            out
          }
          .toDF("id_a", "id_b")
        val survivors =
          if (sampleBcast) pairs
          else {
            val est = udf((a: Array[Long], b: Array[Long]) => sigAgreement(a, b))
            val s = state.select(col("id"), slice(col("sig"), 1, sampleSlots).as("sig"))
            pairs
              .join(s.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
              .join(s.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
              .filter(est(col("sig_a"), col("sig_b")) >= estThr)
              .select("id_a", "id_b")
          }
        val jacText = udf((ta: String, tb: String) =>
          Shingles.jaccard(
            if (ta == null) Array.empty[Long] else Shingles.charShingles(ta, cfg.shingleK),
            if (tb == null) Array.empty[Long] else Shingles.charShingles(tb, cfg.shingleK)))
        val txt = state.select(col("id"), col("text"))
        survivors
          .join(txt.select(col("id").as("id_a"), col("text").as("t_a")), "id_a")
          .join(txt.select(col("id").as("id_b"), col("text").as("t_b")), "id_b")
          .withColumn("jaccard", jacText(col("t_a"), col("t_b")))
          .filter(col("jaccard") >= cfg.minJaccard)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      }

    // eager materialization: small lineage-free pair table out, caches freed
    val out = verified.localCheckpoint(true)
    state.unpersist(false)
    bcasts.foreach(_.destroy())
    if (stats.truncatedBuckets.value > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"minhash_lsh: capped ${stats.truncatedBuckets.value} hot buckets at " +
          s"${cfg.maxBucket} ids (${stats.droppedIds.value} bucket-memberships " +
          "dropped) — near-dup recall is not exhaustive for those buckets")
    (out, stats)
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
