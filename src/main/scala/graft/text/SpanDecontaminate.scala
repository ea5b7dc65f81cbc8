package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.run.Materialize

/** Span-level benchmark decontamination: cut from every corpus document any
  * maximal span covered by k-char windows that appear VERBATIM anywhere in
  * a benchmark/eval set — the span-removal counterpart of the document-level
  * [[graft.dedup.Decontaminate]] (GPT-3 Appendix C and Lee et al. 2022 both
  * remove contaminated spans/documents by exact n-gram overlap with evals).
  *
  * Semantics are hash-free: position i is marked iff
  * `text.substring(i, i+k)` is a member of the benchmark's window set;
  * marked windows merge into disjoint spans exactly as
  * [[SubstrDedup.cutSpans]] (extend while the next marked position overlaps
  * or touches the span). The rolling hash is ONLY a broadcast prefilter —
  * a collision is killed by the string check and a false negative is
  * impossible (equal strings hash equal) — so an independent oracle can
  * replay the contract with plain string operations.
  *
  * 100-TB shape: the probe set is bounded by the BENCHMARK (eval suites are
  * MBs, not TBs), so the default tier broadcasts a sorted hash array + a
  * string HashSet and decontaminates in ONE narrow zero-shuffle pass over
  * the corpus; the only exchange anywhere is the distinct() over benchmark
  * windows. Over the byte budget, the probe strings never touch the
  * driver: per-position candidates (already hash-prefiltered, i.e. rare)
  * shuffle-semi-join against the distinct probe windows — the
  * [[SubstrDedup]] large-tier pattern.
  *
  * Output: (passengers..., cleaned, n_spans, chars_removed) — the
  * [[SubstrDedup.dedup]] contract, so the two compose in a pipeline.
  */
object SpanDecontaminate {

  final case class Config(
      k: Int = 30,
      /** Cardinality guard on distinct probe windows (the pass-1 hash
        * collect: 8 bytes/entry). */
      maxProbes: Long = 10L << 20,
      /** Byte budget for the DRIVER-side probe-string set; above it the
        * membership check stays distributed (large tier). */
      maxProbeChars: Long = 32L << 20
  ) {
    require(k >= 2, s"window length k must be >= 2, got $k")
    require(maxProbeChars > 0, "maxProbeChars must be positive")
  }

  /** Per-eval-item leak audit — the REVERSE direction of [[cut]]: for each
    * benchmark document, how many of its DISTINCT k-char windows appear
    * verbatim anywhere in the corpus ((bench_id, n_windows, n_found)).
    * The fraction n_found/n_windows is the per-item contamination measure
    * evaluation teams report before trusting a score.
    *
    * Shape: probe windows (benchmark-bounded, guarded) broadcast as the
    * usual hash prefilter + string set; ONE narrow corpus pass emits only
    * probe strings actually present (never corpus text), which distinct()
    * down to at most the probe count; a left-semi join back against the
    * per-item window table scores each eval item. The corpus is never
    * shuffled. Hash-free contract (string membership decides), like
    * [[cut]]. */
  def leakReport(
      spark: SparkSession,
      docs: DataFrame,
      benchmark: DataFrame,
      benchIdCol: String,
      textCol: String,
      cfg: Config = Config()
  ): DataFrame = {
    import spark.implicits._
    val k = cfg.k
    val winUdf = udf { (t: String) =>
      if (t == null || t.length < k) Array.empty[String]
      else Array.tabulate(t.length - k + 1)(i => t.substring(i, i + k)).distinct
    }
    // per-item DISTINCT windows (duplicate windows inside one eval item
    // count once); pinned — reused as probe source and as the join side
    val benchWins = Materialize.pin(
      benchmark.select(col(benchIdCol), explode(winUdf(col(textCol))).as("w")))
    val probesDf = benchWins.select("w").distinct()
    // ONE stats job carries both budget guards (count + char mass), still
    // BEFORE any collect; the probe hashes are then derived DRIVER-side
    // from the collected strings (≤ maxProbeChars by the guard) instead of
    // paying a third and fourth distinct-evaluation job (round 6 — the
    // old shape cost 4 sequential jobs over the same tiny distinct)
    val statsRow = probesDf
      .agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L))).head
    val nProbes = statsRow.getLong(0)
    require(nProbes <= cfg.maxProbes,
      s"$nProbes distinct probe windows exceed maxProbes=${cfg.maxProbes} " +
        "— raise k or split the benchmark set")
    val sumChars = statsRow.getLong(1)
    require(sumChars <= cfg.maxProbeChars,
      s"$sumChars probe chars exceed maxProbeChars=${cfg.maxProbeChars}")

    val probes = probesDf.as[String].collect()
    val hashArr = probes.map(w => SubstrDedup.windowHashes(w, k)(0))
    java.util.Arrays.sort(hashArr)
    val hashB = spark.sparkContext.broadcast(hashArr)
    val probeSet = new java.util.HashSet[String](probes.length * 2)
    probes.foreach(probeSet.add)
    val probeB = spark.sparkContext.broadcast(probeSet)

    // one narrow corpus pass: per doc, the probe strings it contains
    // (per-doc set so the exchange carries ≤ |probes| strings per doc)
    val foundUdf = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        val hs = SubstrDedup.windowHashes(t, k)
        val f = hashB.value
        val p = probeB.value
        val out = new java.util.HashSet[String]()
        var i = 0
        while (i < hs.length) {
          if (java.util.Arrays.binarySearch(f, hs(i)) >= 0) {
            val w = t.substring(i, i + k)
            if (p.contains(w)) out.add(w)
          }
          i += 1
        }
        import scala.jdk.CollectionConverters._
        out.asScala.toArray
      }
    }
    // consumed exactly once by the report join below — left LAZY so the
    // corpus pass, the found-distinct and the scoring join all run inside
    // the single report materialization job (pinning it separately cost a
    // whole extra job + block round-trip for a probe-bounded table)
    val foundDf = docs
      .select(explode(foundUdf(col(textCol))).as("w"))
      .distinct()
    val report = Materialize.pin(
      benchWins
        .join(foundDf.withColumnRenamed("w", "_fw"),
          col("w") === col("_fw"), "left")
        .groupBy(benchIdCol)
        .agg(count(lit(1)).as("n_windows"),
          count(col("_fw")).as("n_found")))
    hashB.destroy()
    probeB.destroy()
    benchWins.unpersist(false)
    report
  }

  /** `docs` (idCol, textCol, passengers...) cleaned against `benchmark`
    * (textCol only is read). Null/short corpus texts pass through with
    * zero spans. */
  def cut(
      spark: SparkSession,
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()
  ): DataFrame = {
    import spark.implicits._
    val k = cfg.k

    val passCols = docs.columns.filterNot(_ == textCol).toSeq.map(col)
    val cutCols = Seq(col("_cut.cleaned").as("cleaned"),
      col("_cut.n_spans").as("n_spans"),
      col("_cut.chars_removed").as("chars_removed"))

    // distinct probe windows as STRINGS — the authoritative membership set
    // (one exchange over benchmark windows; benchmark-sized, not corpus-)
    val winUdf = udf { (t: String) =>
      if (t == null || t.length < k) Array.empty[String]
      else Array.tabulate(t.length - k + 1)(i => t.substring(i, i + k))
    }
    val probesDf = Materialize.pin(
      benchmark.select(explode(winUdf(col(textCol))).as("w")).distinct())
    // ONE stats job carries both guards (round 6 — count, hash collect and
    // char-mass sum were three sequential jobs over the same pinned table)
    val statsRow = probesDf
      .agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L))).head
    val nProbes = statsRow.getLong(0)
    require(nProbes <= cfg.maxProbes,
      s"$nProbes distinct probe windows exceed maxProbes=${cfg.maxProbes} " +
        "— raise k or split the benchmark set")
    val sumChars = statsRow.getLong(1)
    val inBudget = sumChars <= cfg.maxProbeChars

    // hash prefilter (always broadcast: 8 bytes/probe — 80 MB at the cap);
    // sorted primitive array, probed once per corpus character. In budget
    // the hashes derive DRIVER-side from the one collected string array;
    // over budget the strings never touch the driver and the hashes come
    // from their own (8-byte-rows) collect.
    val probes: Array[String] =
      if (inBudget) probesDf.as[String].collect() else Array.empty
    val hashArr =
      if (inBudget) probes.map(w => SubstrDedup.windowHashes(w, k)(0))
      else {
        val hashUdf = udf((w: String) => SubstrDedup.windowHashes(w, k)(0))
        probesDf.select(hashUdf(col("w"))).as[Long].collect()
      }
    java.util.Arrays.sort(hashArr)
    val hashB = spark.sparkContext.broadcast(hashArr)

    val result =
      if (inBudget) {
        // SMALL TIER: driver HashSet broadcast, one narrow corpus pass
        val probeSet = new java.util.HashSet[String](probes.length * 2)
        probes.foreach(probeSet.add)
        val probeB = spark.sparkContext.broadcast(probeSet)
        val cutUdf = udf { (t: String) =>
          if (t == null) SubstrDedup.Cut(null, 0, 0)
          else {
            val hs = SubstrDedup.windowHashes(t, k)
            if (hs.isEmpty) SubstrDedup.Cut(t, 0, 0)
            else {
              val f = hashB.value
              val p = probeB.value
              val marked = new Array[Boolean](hs.length)
              var i = 0
              while (i < hs.length) {
                marked(i) = java.util.Arrays.binarySearch(f, hs(i)) >= 0 &&
                  p.contains(t.substring(i, i + k))
                i += 1
              }
              SubstrDedup.cutSpans(t, marked, k)
            }
          }
        }
        val r = Materialize.pin(docs
          .withColumn("_cut", cutUdf(col(textCol)))
          .select(passCols ++ cutCols: _*))
        probeB.destroy()
        r
      } else {
        // LARGE TIER: per-position hash-prefiltered candidates semi-join
        // the distinct probe windows; surviving positions aggregate per doc
        val posUdf = udf { (t: String) =>
          if (t == null) Array.empty[(Int, String)]
          else {
            val hs = SubstrDedup.windowHashes(t, k)
            val f = hashB.value
            val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
            var i = 0
            while (i < hs.length) {
              if (java.util.Arrays.binarySearch(f, hs(i)) >= 0)
                out += ((i, t.substring(i, i + k)))
              i += 1
            }
            out.toArray
          }
        }
        val markedPos = docs
          .select(col(idCol), explode(posUdf(col(textCol))).as("pw"))
          .select(col(idCol), col("pw._1").as("pos"), col("pw._2").as("w"))
          .join(probesDf, Seq("w"), "left_semi")
          .groupBy(idCol)
          .agg(collect_list(col("pos")).as("_marked"))
        val cutAtUdf = udf { (t: String, pos: Array[Int]) =>
          if (t == null) SubstrDedup.Cut(null, 0, 0)
          else if (t.length < k || pos == null || pos.isEmpty)
            SubstrDedup.Cut(t, 0, 0)
          else {
            val marked = new Array[Boolean](t.length - k + 1)
            pos.foreach(p => marked(p) = true)
            SubstrDedup.cutSpans(t, marked, k)
          }
        }
        Materialize.pin(docs
          .join(markedPos, Seq(idCol), "left")
          .withColumn("_cut", cutAtUdf(col(textCol), col("_marked")))
          .select(passCols ++ cutCols: _*))
      }
    hashB.destroy()
    probesDf.unpersist(false)
    result
  }
}
