package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 optimization harness (guide §1.4): noop-sink isolation of the
  * STAGES inside the expensive composite queries, so optimization targets
  * the right stage. NOT part of the frozen driver contract (`graft.Bench`
  * is the only harness the driver reads); numbers from here are cited in
  * OPTIMIZATION_r06.md only.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.BenchExtra [stagePrefix,...]"
  * Emits one JSON line {"stages":{name:sec,...}} (best of 2 reps).
  */
object BenchExtra {

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.headOption.map(_.split(',').map(_.trim).toSeq)
    def selected(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(2)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def turnsMs(): DataFrame = SparkEntry.synthTurns(spark, sfDir).toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))

    // stage catalog: name -> () => DataFrame (built fresh per rep)
    val stages: Seq[(String, () => DataFrame)] = Seq(
      // --- q91/q93/q94 chain pieces -----------------------------------
      "pseudo_entities" -> (() =>
        graft.transcript.Pseudonymize.entities(spark, turnsMs())),
      "pseudo_rewrite" -> (() =>
        graft.transcript.Pseudonymize.rewrite(spark, turnsMs())),
      // --- q94 stage isolation (raw turns stand in for scrubbed text:
      // same row count, same string sizes to first order) --------------
      "sft_turndedup_raw" -> (() =>
        graft.transcript.TurnDedup.dedup(spark, turnsMs())),
      "sft_convgate_raw" -> (() =>
        graft.transcript.ConvGate.signals(spark, turnsMs())),
      "sft_assemble_raw" -> (() =>
        graft.transcript.ConvOps.assemble(spark, turnsMs())),
      "sft_manifest" -> (() =>
        graft.transcript.SftPipeline.manifest(spark, turnsMs())),
      // --- q106 pieces -------------------------------------------------
      "branch_families" -> (() =>
        graft.transcript.BranchFamilies.families(spark,
          graft.transcript.BranchFamilies.inject(turnsMs()))),
      // --- q90 ---------------------------------------------------------
      "turndedup_ordered" -> (() =>
        graft.transcript.TurnDedup.dedup(spark, turnsMs())
          .orderBy("conv_id", "turn_idx")),
      "turndedup_pinned" -> (() =>
        graft.run.Materialize.pin(
          graft.transcript.TurnDedup.dedup(spark, turnsMs()))
          .orderBy("conv_id", "turn_idx")),
      // --- q74 ---------------------------------------------------------
      "line_dedup" -> (() => SparkEntry.queries("q74_line_dedup")(spark, sfDir)),
      "line_wrap_only" -> (() => {
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text")
        val arr = split(col("text"), " ")
        d.select(col("doc_id"),
          array_join(
            transform(sequence(lit(0), size(arr) - 1, lit(4)),
              i => array_join(slice(arr, i + 1, lit(4)), " ")),
            "\n").as("text"))
      }),
      // --- q103 --------------------------------------------------------
      "conv_neardup" -> (() =>
        graft.transcript.ConvNearDup.pairs(spark,
          graft.transcript.ConvNearDup.inject(turnsMs()))),
      // --- q83 stages --------------------------------------------------
      "web_q81" -> (() => SparkEntry.queries("q81_c4_line_filters")(spark, sfDir)),
      "web_q78" -> (() => SparkEntry.queries("q78_repetition")(spark, sfDir)),
      "web_q79" -> (() => SparkEntry.queries("q79_compress_ratio")(spark, sfDir)),
      "web_q70" -> (() => SparkEntry.queries("q70_ccnet_buckets")(spark, sfDir)),
      "web_q77" -> (() => SparkEntry.queries("q77_dsir_select")(spark, sfDir)),
      "web_full" -> (() => SparkEntry.queries("q83_webclean_manifest")(spark, sfDir)),
      // --- q107 --------------------------------------------------------
      "quote_leak" -> (() => SparkEntry.queries("q107_quote_leak")(spark, sfDir)),
      // --- q59 stage isolation ----------------------------------------
      "cap_exact" -> (() => {
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        val minIds = d0
          .groupBy(md5(coalesce(col("text"), lit(""))).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        d0.join(minIds, Seq("doc_id"), "left_semi")
      }),
      "cap_pairs" -> (() => {
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
        graft.dedup.NgramJaccard.similarPairs(spark,
          d0.select(col("doc_id").as("id"), col("text")), n = 2, tau = 0.5)
      }),
      "cap_substr" -> (() => {
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"), col("source"))
        graft.text.SubstrDedup.dedup(spark, d0, "doc_id", "text",
          graft.text.SubstrDedup.Config(k = 25, minCount = 2), None)
      }),
      "cap_full" -> (() => SparkEntry.queries("q59_capstone_manifest")(spark, sfDir)),
      // --- q59 phase timing: replicate the composition with per-phase
      // wall clocks (each phase ends at a pin/action barrier, so the
      // printed deltas are real job time, not lazy-plan time) ------------
      "cap_phases" -> (() => {
        def t[A](name: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val r = f
          System.err.println(f"[bx]   phase $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
          r
        }
        val obsExact = org.apache.spark.sql.Observation()
        val obsDd = org.apache.spark.sql.Observation()
        val obsSub = org.apache.spark.sql.Observation()
        val obsCl = org.apache.spark.sql.Observation()
        val wordsOf = (c: org.apache.spark.sql.Column) =>
          when(c.isNull || length(trim(c)) === 0, 0)
            .otherwise(size(filter(split(trim(c), "\\s+"), x => length(x) > 0)))
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        val exact = t("exact") {
          val minIds = d0
            .groupBy(md5(coalesce(col("text"), lit(""))).as("h"))
            .agg(min(col("doc_id")).as("doc_id"))
            .select("doc_id")
          graft.run.Materialize.pin(d0.join(minIds, Seq("doc_id"), "left_semi")
            .observe(obsExact, count(lit(1)).as("n")))
        }
        val reps59 = t("pairs+cc") {
          val pairs = graft.dedup.NgramJaccard
            .similarPairs(spark, exact.select(col("doc_id").as("id"), col("text")),
              n = 2, tau = 0.5)
            .select(col("id_a").as("src"), col("id_b").as("dst"))
          graft.dedup.DupGroups
            .components(spark, pairs, exact.select(col("doc_id").as("id")))
            .filter(col("keep")).select(col("id").as("doc_id"))
        }
        val dd = t("dd-pin") {
          graft.run.Materialize.pin(exact.join(reps59, Seq("doc_id"), "left_semi")
            .observe(obsDd, count(lit(1)).as("n")))
        }
        val sd = t("substr") {
          val sd0 = graft.text.SubstrDedup.dedup(spark, dd, "doc_id", "text",
            graft.text.SubstrDedup.Config(k = 25, minCount = 2), Some(obsSub))
          sd0.select(col("doc_id"), col("cleaned").as("text"), col("source"))
            .withColumn("n_chars", length(col("text")))
        }
        val cl = t("decon-pin") {
          val bench = sd.filter(pmod(col("doc_id"), lit(41)) === 0).select("text")
          val dirty = graft.dedup.Decontaminate
            .contaminated(spark, sd, bench, "doc_id", "text", n = 3)
            .select(col("doc_id"))
          graft.run.Materialize.pin(sd.join(dirty, Seq("doc_id"), "left_anti")
            .observe(obsCl, count(lit(1)).as("n")))
        }
        val weights = t("weights") {
          graft.sample.Mixture.weights(cl, col("source"), col("n_chars"), alpha = 0.5)
        }
        val inter = t("interleave") {
          graft.sample.Interleave
            .byWeight(spark, cl, col("source"), col("doc_id"), weights)
            .withColumn("n_tokens", wordsOf(col("text")))
        }
        t("pack+manifest") {
          val packed = graft.operators.Pack.contiguousScalable(spark,
            inter, Seq("source"), "interleave_rank", "n_tokens", budget = 256L)
          def oc(o: org.apache.spark.sql.Observation): Long =
            o.get("n").asInstanceOf[Long]
          packed.groupBy("source", "bin")
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_tokens")).as("sum_tokens"),
              min(col("interleave_rank")).as("min_rank"))
            .withColumn("n_exact", lit(oc(obsExact)))
            .withColumn("n_dedup", lit(oc(obsDd)))
            .withColumn("n_substr", lit(obsSub.get("n_substr").asInstanceOf[Long]))
            .withColumn("n_clean", lit(oc(obsCl)))
            .orderBy("source", "bin")
            .localCheckpoint(true)
        }
      }),
      // --- other heavies -----------------------------------------------
      "x_q31" -> (() => SparkEntry.queries("q31_lineage_metrics")(spark, sfDir)),
      "x_q86" -> (() => SparkEntry.queries("q86_lr_distributed")(spark, sfDir)),
      "x_q104" -> (() => SparkEntry.queries("q104_tool_profile")(spark, sfDir)),
      "x_q33" -> (() => SparkEntry.queries("q33_drop_reasons")(spark, sfDir)),
      "x_q16" -> (() => SparkEntry.queries("q16_minhash_pairs")(spark, sfDir)),
      "x_q03" -> (() => SparkEntry.queries("q03_top_customers")(spark, sfDir)),
      "x_q92" -> (() => SparkEntry.queries("q92_conv_gate")(spark, sfDir)),
      "x_q97" -> (() => SparkEntry.queries("q97_cross_turn")(spark, sfDir)),
      "x_q88" -> (() => SparkEntry.queries("q88_conv_repair")(spark, sfDir)),
      // --- q96 pack stage on a fake manifest-shaped input --------------
      "sft_pack_full" -> (() => SparkEntry.queries("q96_sft_pack")(spark, sfDir))
    )

    // warmup at the smallest sf is unnecessary here — stages are timed
    // best-of-N with rep 1 as the warm rep when N >= 2
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    stages.filter(s => selected(s._1)).foreach { case (name, mk) =>
      var best = Double.MaxValue
      var rep = 0
      while (rep < reps) {
        val t0 = System.nanoTime()
        try { force(mk()) } catch {
          case e: Throwable => System.err.println(s"[bx] $name FAILED: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bx]   rep${rep + 1} $name%-22s $dt%7.3f s")
        best = math.min(best, dt)
        graft.run.Materialize.releaseAll(spark)
        System.gc()
        rep += 1
      }
      results(name) = best
      System.err.println(f"[bx] $name%-24s $best%7.3f s")
    }
    val js = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"stages":$js,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
