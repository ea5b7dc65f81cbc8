package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{MinHashLSH, Shingles, SimHash}
import graft.sim.Ann

class DedupSpec extends AnyFunSuite with SparkTestBase {

  /** Synthetic corpus: 60 base docs, each with 0-2 near-dup mutations and a
    * couple of exact copies — all deterministic. */
  private def corpus: Seq[(Long, String)] = {
    val rng = new graft.gen.TranscriptGen.Rng(99L)
    val bases = (0 until 60).map { i =>
      (0 until 8).map(_ => s"sentence ${rng.nextInt(1000)} about topic ${rng.nextInt(50)} " +
        s"with detail ${rng.nextInt(1000)}").mkString(". ")
    }
    var id = -1L
    bases.zipWithIndex.flatMap { case (b, i) =>
      val variants = scala.collection.mutable.ArrayBuffer[String](b)
      if (i % 3 == 0) variants += b.replace("topic", "subject") // near-dup
      if (i % 5 == 0) variants += b // exact dup
      if (i % 7 == 0) variants += (b + " extra trailing clause appended here")
      variants.map { v => id += 1; (id, v) }
    }
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs (J >= 0.8)") {
    import spark.implicits._
    val cfg = MinHashLSH.Config()
    val expected = MinHashLSH.bruteForcePairs(corpus, cfg)
      .map(p => (p._1, p._2)).toSet
    assert(expected.nonEmpty, "test corpus must contain near-dups")

    val df = corpus.toDF("id", "text")
    val got = MinHashLSH.nearDuplicates(spark, df, cfg)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // LSH at 16x8 detects J>=0.8 w.p. ~1; no false positives after verify
    assert(got.subsetOf(expected), s"false positives: ${got -- expected}")
    val recall = (got & expected).size.toDouble / expected.size
    info(f"minhash recall = $recall%.3f over ${expected.size} true pairs")
    assert(recall >= 0.95)
  }

  test("minhash LSH shuffle-join path (forced big-corpus mode) matches small-mode result") {
    import spark.implicits._
    val df = corpus.toDF("id", "text")
    val small = MinHashLSH.nearDuplicates(spark, df, MinHashLSH.Config())
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // maxBroadcastBytes = 0 forces the 100-TB path with the JOIN-side
    // sampled prefilter (the sample table does not fit either)
    val big = MinHashLSH.nearDuplicates(spark, df, MinHashLSH.Config(maxBroadcastBytes = 0))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(big === small)
    // a budget too small for full state but big enough for the 16-slot
    // sample table exercises the MAP-SIDE sampled prefilter (prefilter
    // inside the bucket flatMap, no candidate-pair join at all)
    val midBudget = MinHashLSH.Config().midTierBudget(corpus.size.toLong)
    val mid = MinHashLSH.nearDuplicates(spark, df,
      MinHashLSH.Config(maxBroadcastBytes = midBudget))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(mid === small)
  }

  test("minhash bucket cap is accounted, not silent") {
    import spark.implicits._
    // 20 identical docs -> one bucket of 20 per band; cap at 8 must truncate
    val dup = (0 until 20).map(i => (i.toLong, "identical text for every doc here"))
    val cfg = MinHashLSH.Config(maxBucket = 8)
    val (pairs, stats) = MinHashLSH.nearDuplicatesWithStats(spark, dup.toDF("id", "text"), cfg)
    pairs.count() // materialized (localCheckpoint already ran, but be explicit)
    assert(stats.truncatedBuckets.value > 0, "expected truncated buckets to be counted")
    assert(stats.droppedIds.value > 0, "expected dropped bucket-memberships to be counted")
  }

  test("jaccard kernel: identical=1, disjoint=0, known overlap") {
    val a = Shingles.charShingles("the quick brown fox jumps over the lazy dog")
    assert(Shingles.jaccard(a, a) === 1.0)
    val b = Shingles.charShingles("completely different words entirely unrelated")
    assert(Shingles.jaccard(a, b) < 0.05)
  }

  test("simhash blocking finds all pairs within hamming<=3, no extras") {
    import spark.implicits._
    val docs = corpus
    val sigs = docs.map { case (id, t) => (id, SimHash.simhash(t)) }
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      if SimHash.hamming(sigs(i)._2, sigs(j)._2) <= 3
    } yield (sigs(i)._1, sigs(j)._1)).toSet
    assert(expected.nonEmpty)

    val got = SimHash.nearDuplicates(spark, docs.toDF("id", "text"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === expected) // blocking guarantees recall 1 for hamming < blocks
  }

  test("brute-force ANN matches driver-side exact top-k on the embeddings table") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val queries = all.take(5)
    val k = 10

    val got = Ann.bruteForceTopK(spark, emb, queries, k)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    queries.foreach { case (qid, qv) =>
      val exact = all
        .map { case (vid, v) => (vid, Ann.cosine(qv, v)) }
        .sortBy { case (vid, s) => (-s, vid) }
        .take(k).map(_._1).toSeq
      assert(got(qid) === exact, s"query $qid")
    }
  }

  /** Deterministic clustered vectors: 20 centers, 50 points each with small
    * noise — the regime ANN indexes are for. (The driver's embeddings table
    * is ~isotropic random noise — top-10 mean cosine 0.30 — where no
    * sublinear ANN can have high recall; brute force covers that table.) */
  private def clusteredVectors(dim: Int = 64): Array[(Long, Array[Float])] = {
    val rng = new graft.gen.TranscriptGen.Rng(5L)
    def gauss(): Double = {
      val u1 = math.max(1e-12, rng.nextDouble()); val u2 = rng.nextDouble()
      math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    }
    val centers = Array.fill(20)(Array.fill(dim)(gauss().toFloat))
    var id = -1L
    centers.flatMap { c =>
      Array.fill(50) {
        id += 1
        (id, c.zipWithIndex.map { case (x, _) => x + 0.15f * gauss().toFloat })
      }
    }
  }

  test("int8 quantized ANN: kernel invariants + recall vs float32 exact baseline") {
    import spark.implicits._
    import graft.sim.Quantize

    // kernel invariants
    val v = Array(0.5f, -1.0f, 0.25f, 0f)
    val (q, s) = Quantize.quantize(v)
    assert(s === 1.0f && q.toSeq === Seq[Byte](64, -127, 32, 0))
    assert(math.abs(Quantize.cosineQ(q, q) - 1.0) < 1e-12)
    // per-vector scales cancel: quantizing a scaled copy gives the same cosine
    val (q2, _) = Quantize.quantize(v.map(_ * 42f))
    assert(q2.toSeq === q.toSeq)
    val (z, zs) = Quantize.quantize(Array(0f, 0f))
    assert(zs === 0f && Quantize.cosineQ(z, z) === 0.0)

    // recall vs the float32 exact top-k on clustered data
    val vecs = clusteredVectors()
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val queries = vecs.take(10)
    val k = 10
    val exact = Ann.bruteForceTopK(spark, df, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val quantized = Quantize.quantizeCorpus(df)
    val got = Quantize.topKQuantized(spark, quantized, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"int8 ann recall = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f too low for int8 rounding")

    // retrieve-then-rerank: int8 shortlist + exact float rescoring must
    // reproduce the exact float top-k, rank included
    val exactRanked = Ann.bruteForceTopK(spark, df, queries, k)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val reranked = Quantize.rerankTopK(spark, df, queries, k)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(reranked === exactRanked, "rerank must equal exact float top-k")

    // adversarial: 300 vectors all within quantization noise of each
    // other — the int8 shortlist ordering is meaningless, the soundness
    // certificate must fail, and the float fallback must keep exactness
    val base = Array.fill(64)(1.0f)
    val tied = (0L until 300L).map { i =>
      (i, base.zipWithIndex.map { case (x, j) =>
        x + ((i * 31 + j) % 7).toFloat * 1e-4f
      })
    }
    val tdf = tied.toSeq.toDF("vec_id", "embedding")
    val tq = tied.take(3).toArray
    val tExact = Ann.bruteForceTopK(spark, tdf, tq, k)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val tRerank = Quantize.rerankTopK(spark, tdf, tq, k)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(tRerank === tExact, "fallback path must preserve exactness")
  }

  test("rerank shortlist: large id sets broadcast-semi-join, small sets stay IN") {
    import spark.implicits._
    import graft.sim.Quantize
    val df = clusteredVectors().toSeq.toDF("vec_id", "embedding")

    // large shortlist (a 10k-query batch shape): must plan a broadcast
    // LEFT SEMI hash join, never a multi-thousand-literal In predicate
    val bigIds = (0L until 5000L).toSeq
    val big = Quantize.idFilter(spark, df, bigIds)
    big.collect()
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("BroadcastHashJoin") && bigPlan.contains("LeftSemi"),
      s"expected broadcast semi-join:\n$bigPlan")
    assert(!bigPlan.contains(" IN ") && !bigPlan.contains("InSet"),
      s"literal IN over a large shortlist:\n$bigPlan")

    // small shortlist keeps the pushable IN filter (no join machinery)
    val small = Quantize.idFilter(spark, df, Seq(1L, 2L, 3L))
    small.collect()
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(!smallPlan.contains("BroadcastHashJoin"),
      s"small shortlist should not join:\n$smallPlan")

    // both restrict to exactly the requested ids
    assert(small.select("vec_id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(big.count() === df.filter(col("vec_id") < 5000).count())
  }

  test("Bloom-prefiltered incremental dedup == plain anti-join, FP path exercised") {
    import spark.implicits._
    import graft.dedup.Incremental
    // 4000 existing, 3000-row batch: 1000 true dups + 2000 new; an
    // undersized filter (expectedItems=50) saturates fpp so MANY new rows
    // take the exact-verify path — the equality below proves FPs never leak
    val existing = (0L until 4000L).map(i => ("e", i)).toDF("tag", "h0")
      .select(xxhash64(concat(col("tag"), col("h0"))).as("h"))
    val batch = ((0L until 1000L).map(i => ("e", i, i)) ++
      (0L until 2000L).map(i => ("n", i, 10000L + i)))
      .toDF("tag", "h0", "id")
      .select(col("id"), xxhash64(concat(col("tag"), col("h0"))).as("h"))

    // null hashes must pass through like the plain anti-join keeps them
    // (null keys never match), not vanish in the Bloom prefilter
    val withNull = batch.unionByName(
      Seq((99999L, Option.empty[Long])).toDF("id", "h"))

    val exact = withNull.join(existing, Seq("h"), "left_anti")
      .select("id").as[Long].collect().toSet
    val viaBloom = Incremental
      .newRows(spark, withNull, existing, "h", expectedItems = 50, fpp = 0.03)
      .select("id").as[Long].collect().toSet
    assert(viaBloom === exact)
    assert(exact.size === 2001 && exact.contains(99999L))

    // right-sized filter: only ~dups+fpp·batch rows may reach the verify
    // join — count them through the possible-dup predicate the operator uses
    val bf = Incremental.buildFilter(existing, "h", 4000L, 0.01)
    val nPossible = batch.collect().count(r => bf.mightContainLong(r.getLong(1)))
    assert(nPossible < 1000 + 200,
      s"$nPossible possible-dups for 1000 true dups at fpp=0.01")

    // steady state: persist → reload → prebuilt-filter path gives the same
    // exact result; merging an increment's bits extends coverage
    val fPath = "file://" + java.nio.file.Files
      .createTempDirectory("graft_bloom_").toString + "/corpus.bloom"
    Incremental.writeFilter(bf, fPath)
    val reloaded = Incremental.readFilter(fPath)
    val viaPrebuilt = Incremental
      .newRowsWithFilter(spark, batch, existing, "h", reloaded)
      .select("id").as[Long].collect().toSet
    assert(viaPrebuilt === batch.join(existing, Seq("h"), "left_anti")
      .select("id").as[Long].collect().toSet)
    // increments must use the SAME sizing: Spark refuses to merge
    // different bit sizes (sizing is part of the persisted-filter contract)
    val increment = batch.filter(col("id") >= 10000L).select("h")
    reloaded.mergeInPlace(Incremental.buildFilter(increment, "h", 4000L, 0.01))
    val missed = increment.as[Long].collect().count(h => !reloaded.mightContainLong(h))
    assert(missed === 0, "merged filter must cover the increment (no false negatives)")

    // a non-bigint hash column would be implicitly cast to null by the
    // Bloom-probe UDF and its rows silently dropped from both branches —
    // the operator must reject it upfront instead
    val hexBatch = batch.select(col("id"), hex(col("h")).as("h"))
    intercept[IllegalArgumentException] {
      Incremental.newRows(spark, hexBatch, existing, "h", expectedItems = 50)
    }
    intercept[IllegalArgumentException] {
      Incremental.newRowsWithFilter(spark, batch,
        existing.select(hex(col("h")).as("h")), "h", bf)
    }
  }

  test("thresholdPairs: exact cosine pair join equals driver brute force, chunked") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val tau = 0.8
    val expected = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      c = Ann.cosine(vecs(i)._2, vecs(j)._2) if c >= tau
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    assert(expected.size > 100, "clustered corpus must contain many pairs")

    // budget forces ~8 chunks: the multi-scan path, not one big broadcast
    val got = Ann.thresholdPairs(spark, df, tau,
      maxBroadcastBytes = vecs.length.toLong * (4 * 32 + 48) / 8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "each pair must be emitted exactly once")
    assert(got.toSet === expected)

    // the verifier contract is LOUD: a corpus estimated above the budget
    // must fail fast naming the scale path, before any chunk is collected
    val e = intercept[IllegalArgumentException] {
      Ann.thresholdPairs(spark, df, tau, verifierBudgetBytes = 64L)
    }
    assert(e.getMessage.contains("nearDuplicatePairs"))
  }

  test("LSH ANN recall vs exact baseline on clustered data") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val queries = vecs.take(10)
    val k = 10
    val exact = Ann.bruteForceTopK(spark, df, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(spark, df, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"lsh ann recall = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f too low on clustered data")
  }

  test("IVF ANN recall vs exact baseline on clustered data") {
    import spark.implicits._
    val vecs = clusteredVectors()
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val queries = vecs.take(10)
    val k = 10
    val index = graft.sim.Ivf.train(spark, df, k = 24)
    assert(index.centroids.length === 24)
    val exact = Ann.bruteForceTopK(spark, df, queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = graft.sim.Ivf.topK(spark, df, index, queries, k, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"ivf ann recall = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f too low on clustered data")

    // persisted index: identical results through the on-disk bucketed lists,
    // and the scan is PARTITION-PRUNED to the probed list_ids
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString
    graft.sim.Ivf.writeIndex(spark, df, index, idxPath)
    assert(graft.sim.Ivf.readIndex(spark, idxPath).centroids.length === 24)
    val viaIndex = graft.sim.Ivf.topKIndexed(spark, idxPath, queries, k, nProbe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(viaIndex === approx, "indexed path must equal the in-memory path")

    val pruned = graft.sim.Ivf.probedLists(spark, idxPath, index, queries, nProbe = 3)
    val scanPlan = pruned.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters") && scanPlan.contains("list_id"),
      s"expected list_id partition pruning in scan:\n$scanPlan")
    val probedIds = queries.flatMap { case (_, qv) => index.nearest(qv, 3) }.distinct
    assert(probedIds.length < 24, "test setup: probes must not cover all lists")
    // the pruned scan reads only the probed lists' rows
    val assignedAll = graft.sim.Ivf.assign(spark, df, index)
    val expectRows = assignedAll.filter(col("list_id").isin(probedIds.toSeq: _*)).count()
    assert(pruned.count() === expectRows)
    assert(pruned.count() < df.count(), "pruned scan must not read the whole corpus")
  }

  test("embedding near-dup pairs: planted duplicate is found") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    // plant: vec 9001 = copy of vec 0 with tiny noise
    val v0 = emb(0)._2
    val planted = v0.zipWithIndex.map { case (x, i) => x + (if (i % 7 == 0) 1e-4f else 0f) }
    val df = (emb :+ (9001L, planted)).toSeq.toDF("vec_id", "embedding")
    val pairs = Ann.nearDuplicatePairs(spark, df, minCosine = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((emb(0)._1, 9001L)) || pairs.contains((9001L, emb(0)._1)),
      s"planted pair missing; got ${pairs.take(10)}")

    // the 100-TB shuffle-join verify path (forced by a zero broadcast budget)
    // must produce the identical pair set
    val pairsLarge = Ann.nearDuplicatePairs(spark, df, minCosine = 0.98,
        maxBroadcastBytes = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairsLarge === pairs,
      s"large-mode pairs diverge: only-small=${(pairs -- pairsLarge).take(5)} " +
        s"only-large=${(pairsLarge -- pairs).take(5)}")
  }
}
