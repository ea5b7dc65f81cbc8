package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md protocol): the SAME
  * flagship job over the SAME staged parquet input at two parallelism
  * levels (sandbox proxy for N vs 4N executors: real executor JVMs via
  * local-cluster). Staging (synthesize → parquet) is untimed — at
  * production scale the input is a table scan, not generation.
  *
  * Two modes:
  *
  *   runMain graft.Scaling <nExecutors> [nConvs] [repeats]
  *     one level per invocation, median turns/sec of the reps (the
  *     rounds-1..4 protocol; kept for comparability with the BASELINE.md
  *     session tables).
  *
  *   runMain graft.Scaling paired [nConvs] [pairs] [repsN] [reps4N]
  *     INTERLEAVED pairs: N,4N,N,4N,… within one invocation — each pair
  *     boots a fresh 1×4 local-cluster, times repsN reps, tears it
  *     down, then immediately does the same at 4×4 for reps4N reps, so the
  *     two sides of a pair run minutes apart and a host-noise burst hits
  *     both roughly equally instead of poisoning one whole level. The
  *     reported estimator is the MEDIAN OF PER-PAIR EFFICIENCIES
  *     ((bestSecN / bestSec4N) / 4 per pair) — burst-robust without any
  *     manual quiet-window hunting, which in round 4 cost ~2.5 h of
  *     retries across nine noisy sessions (VERDICT r4 task #5).
  *     reps4N defaults to 2×repsN: measured burst asymmetry — the 16-core
  *     side starves under neighbor load far more often than the 4-core
  *     side (round-5 session 1: N reps spread ±8%, 4N reps spread 3×) —
  *     and a 4N rep costs ~¼ of an N rep, so oversampling the noisy side
  *     is nearly free and doubles the chance of catching a quiet slot.
  *
  * (cores = nExecutors × GRAFT_CORES_PER_EXEC, default 8 per executor;
  * paired mode fixes 4 cores/executor, the BASELINE.md shape. local-cluster
  * needs SPARK_HOME=/opt/spark and SPARK_SCALA_VERSION=2.13 in the env.)
  */
object Scaling {

  /** Bump when TranscriptGen's distribution or the staging params change —
    * the on-disk cache is keyed by this, so stale pre-change data can never
    * be silently re-measured. */
  private val genVersion = "g2_m20000"

  def stagedInput(spark: SparkSession, nConvs: Long): String = {
    val dir = s"/tmp/graft_stage_${nConvs}_$genVersion"
    if (!Files.exists(Paths.get(dir, "_SUCCESS"))) {
      // 64 ~1MB files: enough splits that BOTH parallelism levels see the
      // same work units (at production scale the table has ample splits;
      // the defaults tuned for 128MB row groups would starve a 32-core
      // local run on a bench-sized input)
      graft.gen.TranscriptGen.dataset(spark, nConvs, megaTurns = 20000)
        .coalesce(64)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** A fresh local-cluster session — REAL executor JVMs (the faithful
    * sandbox proxy for "N executors vs 4N executors"; a single shared-heap
    * local[n] JVM understates scaling: GC + allocator contention that a
    * real cluster does not have). */
  private def buildSession(nExecutors: Int, coresPerExec: Int): SparkSession = {
    val cores = nExecutors * coresPerExec
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nExecutors,$coresPerExec,8192]")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.memory", "7g")
      // throughput GC for the batch pipeline (default G1 trades throughput
      // for pause targets this job does not need)
      .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
      .config("spark.sql.shuffle.partitions", cores * 3) // 3x cores: multi-wave stages absorb skew stragglers
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // scan-split sizing for the bench-scale input (see stagedInput)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Warm up (JIT + codegen in the fresh executor JVMs) then time `repeats`
    * full-pipeline passes over the staged input. Returns (nTurns, times). */
  private def measure(
      spark: SparkSession, dir: String, repeats: Int): (Long, Seq[Double]) = {
    import spark.implicits._
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    val nTurns = turns.count()
    Bench.force(graft.run.QualityFilter(spark,
      spark.read.parquet(dir).limit(20000).as[graft.model.Turn]))
    val secs = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      Bench.force(graft.run.QualityFilter(spark, turns))
      val dt = (System.nanoTime() - t0) / 1e9
      // driver GC triggers ContextCleaner → stale shuffle/broadcast blocks
      // are released on the executors between reps (otherwise executor
      // old-gen grows monotonically and later reps measure GC, not the job)
      System.gc()
      Thread.sleep(2000)
      dt
    }
    (nTurns, secs)
  }

  /** Session teardown that leaves the JVM clean for the next builder call
    * (paired mode boots many sessions in one process). */
  private def teardown(spark: SparkSession): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** QUIETEST-PAIR estimator (pure, replay-tested in ScalingSpec): given
    * per-pair (bestN, best4N) seconds, pick the pair with the smallest total
    * work-proxy bestN + 4×best4N ≈ core-seconds — host interference only
    * ever ADDS time, and it inflates this proxy no matter which side a burst
    * hits, so the minimum identifies the least-contended pair without a
    * human judging windows. Returns (pairIndex, efficiency, loadProxySec).
    * Across the three round-5 sessions, whose session MEDIANS swung
    * 0.537→0.784 with window load, this statistic read 0.824/0.822/0.792 —
    * stable where the median is load-hostage (BASELINE.md round-5 tables).
    */
  def quietestPair(bests: Seq[(Double, Double)]): (Int, Double, Double) = {
    require(bests.nonEmpty, "quietestPair needs at least one pair")
    val i = bests.indices.minBy(j => bests(j)._1 + 4 * bests(j)._2)
    val (n, n4) = bests(i)
    (i, (n / n4) / 4.0, n + 4 * n4)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    // true median: even counts average the middle two (the upper-middle
    // order statistic biases high on a noisy host where interference only
    // ever ADDS time)
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  private def fmt(xs: Seq[Double]): String =
    xs.map(s => f"$s%.2f").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimal dots
    if (args.headOption.contains("paired")) paired(args) else single(args)
  }

  /** Rounds-1..4 protocol: one parallelism level per invocation. */
  private def single(args: Array[String]): Unit = {
    val nExecutors = args.headOption.getOrElse("1").toInt
    val coresPerExec = sys.env.getOrElse("GRAFT_CORES_PER_EXEC", "8").toInt
    val nConvs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val repeats = args.lift(2).map(_.toInt).getOrElse(3)

    val spark = buildSession(nExecutors, coresPerExec)
    val dir = stagedInput(spark, nConvs)
    val (nTurns, secsRaw) = measure(spark, dir, repeats)
    val secs = secsRaw.sorted
    val med = median(secs)
    val tps = nTurns / med
    println(
      f"""{"scaling":{"cores":${nExecutors * coresPerExec},"n_turns":$nTurns,"secs":${fmt(secs)},"median_sec":$med%.2f,"turns_per_sec":$tps%.1f}}""")
    teardown(spark)
  }

  /** Interleaved N,4N,… pairs; per-pair efficiency from best-of-reps on
    * each side (interference only ever ADDS time, so within a pair the MIN
    * is the cleanest estimate of each side's uncontended cost); headline =
    * median over pairs. */
  private def paired(args: Array[String]): Unit = {
    val coresPerExec = 4 // the BASELINE.md N=1×4 vs 4N=4×4 shape
    val nConvs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val pairs = args.lift(2).map(_.toInt).getOrElse(5)
    val repsN = args.lift(3).map(_.toInt).getOrElse(2)
    val reps4N = args.lift(4).map(_.toInt).getOrElse(repsN * 2)

    // stage once up front (cheap local session; cached across sessions by
    // the _SUCCESS marker) so no pair's N side pays a one-time staging cost
    locally {
      val s = SparkSession.builder().master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      stagedInput(s, nConvs)
      teardown(s)
    }
    val dir = s"/tmp/graft_stage_${nConvs}_$genVersion"

    case class Side(cores: Int, nTurns: Long, secs: Seq[Double]) {
      def best: Double = secs.min
    }
    def runSide(nExecutors: Int, reps: Int): Side = {
      val spark = buildSession(nExecutors, coresPerExec)
      try {
        val (nTurns, secs) = measure(spark, dir, reps)
        Side(nExecutors * coresPerExec, nTurns, secs)
      } finally teardown(spark)
    }

    val results = (1 to pairs).map { p =>
      val n = runSide(1, repsN)
      val n4 = runSide(4, reps4N)
      val eff = (n.best / n4.best) / 4.0
      System.err.println(
        f"[scaling] pair $p: N best ${n.best}%.2f s, 4N best ${n4.best}%.2f s, efficiency $eff%.3f")
      (n, n4, eff)
    }
    val effs = results.map(_._3)
    val nTurns = results.head._1.nTurns
    val (_, quietEff, quietLoad) =
      quietestPair(results.map { case (n, n4, _) => (n.best, n4.best) })
    val pairJson = results.map { case (n, n4, eff) =>
      f"""{"n_secs":${fmt(n.secs)},"n4_secs":${fmt(n4.secs)},"efficiency":$eff%.3f}"""
    }.mkString("[", ",", "]")
    val bestN = results.map(_._1.best).min
    val bestN4 = results.map(_._2.best).min
    val json =
      f"""{"scaling_paired":{"n_turns":$nTurns,"pairs":$pairs,"reps_n":$repsN,"reps_4n":$reps4N,"pair_results":$pairJson,"efficiencies":${fmt(effs)},"median_efficiency":${median(effs)}%.3f,"quietest_pair_efficiency":$quietEff%.3f,"quietest_pair_load_sec":$quietLoad%.2f,"best_n_sec":$bestN%.2f,"best_n4_sec":$bestN4%.2f,"best_vs_best_efficiency":${(bestN / bestN4) / 4.0}%.3f,"n_turns_per_sec":${nTurns / bestN}%.1f,"n4_turns_per_sec":${nTurns / bestN4}%.1f}}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "scaling_out.json")
    try Files.write(Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[scaling] write $outFile: $e") }
  }
}
