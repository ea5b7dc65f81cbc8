package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.md protocol): the SAME
  * flagship job over the SAME staged parquet input at a given parallelism
  * (sandbox proxy for N vs 4N executors: local[8] vs local[32]); reports
  * median turns/sec of 3 runs. Staging (synthesize → parquet) is untimed —
  * at production scale the input is a table scan, not generation.
  *
  * Usage: runMain graft.Scaling <nExecutors> [nConvs] [repeats]
  * (cores = nExecutors x GRAFT_CORES_PER_EXEC, default 8 per executor)
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

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimal dots
    val nExecutors = args.headOption.getOrElse("1").toInt
    val coresPerExec = sys.env.getOrElse("GRAFT_CORES_PER_EXEC", "8").toInt
    val cores = nExecutors * coresPerExec
    val nConvs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val repeats = args.lift(2).map(_.toInt).getOrElse(3)

    // local-cluster: REAL executor JVMs (needs SPARK_HOME=/opt/spark in env)
    // — the faithful sandbox proxy for "N executors vs 4N executors"; a
    // single shared-heap local[n] JVM understates scaling (GC + allocator
    // contention that a real cluster does not have).
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
    import spark.implicits._

    val dir = stagedInput(spark, nConvs)
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    val nTurns = turns.count()

    // warmup (JIT + codegen) on a small slice
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
    }.sorted
    // true median: even rep counts average the middle two (the upper-middle
    // order statistic biases high on a noisy host where interference only
    // ever ADDS time)
    val median =
      if (secs.length % 2 == 1) secs(secs.length / 2)
      else (secs(secs.length / 2 - 1) + secs(secs.length / 2)) / 2.0
    val tps = nTurns / median
    println(
      f"""{"scaling":{"cores":$cores,"n_turns":$nTurns,"secs":[${secs.map(s => f"$s%.2f").mkString(",")}],"median_sec":$median%.2f,"turns_per_sec":$tps%.1f}}""")
    spark.stop()
  }
}
