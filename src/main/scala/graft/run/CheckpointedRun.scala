package graft.run

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CleanConfig, Turn}
import graft.quality.FilterConfig

/** Checkpointed, resumable execution of the quality-filter pipeline with
  * per-partition lineage + metrics (north_rule).
  *
  * The output table is the sandbox's Iceberg stand-in (SURVEY.md §7.1 — no
  * Iceberg runtime jar ships with the image): conv_id-hash-bucketed parquet
  * (`bucket=NN/` directories) plus a JSON manifest that plays the role of the
  * Iceberg snapshot/manifest list. A real Iceberg catalog is a drop-in: the
  * manifest maps 1:1 onto a snapshot's data-file list and summary metrics.
  *
  * Commit protocol (idempotent, partition-grained):
  *   1. read the manifest → set of committed buckets (+ config fingerprint);
  *      a fingerprint change invalidates all buckets (the plan changed)
  *   2. ONE Spark job over the still-pending buckets only
  *      (`pmod(xxhash64(conv_id), B)` pruned at the scan/filter), written
  *      with dynamic partition overwrite — a bucket directory is replaced
  *      atomically per task-commit, never appended twice
  *   3. per-bucket lineage rows (rows, kept, wall time, fingerprint) are
  *      appended to the manifest via write-temp-then-atomic-rename
  *
  * Exact resume: killing the job between 2 and 3 re-runs only buckets whose
  * manifest entry is missing; generation determinism (TranscriptGen) or the
  * immutable input table guarantees byte-identical bucket contents.
  */
object CheckpointedRun {

  final case class BucketEntry(
      bucket: Int,
      rows: Long,
      kept: Long,
      wallMs: Long,
      fingerprint: String
  )

  /** Stable fingerprint of the logical plan configuration. */
  def fingerprint(cleanCfg: CleanConfig, filterCfg: FilterConfig, nBuckets: Int): String = {
    val payload = s"$cleanCfg|$filterCfg|$nBuckets|v1"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(payload.getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  // -- manifest I/O (tiny hand-rolled JSON — no extra deps) ----------------

  private def manifestPath(out: String): Path = Paths.get(out, "_graft_manifest.json")

  def readManifest(out: String): Seq[BucketEntry] = {
    val p = manifestPath(out)
    if (!Files.exists(p)) return Nil
    parseManifest(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  private def parseManifest(txt: String): Seq[BucketEntry] =
    """\{[^}]*\}""".r.findAllIn(txt).toSeq.flatMap { obj =>
      def field(k: String): Option[String] =
        (k + "\":\\s*\"?([^,\"}]+)").r.findFirstMatchIn(obj).map(_.group(1))
      for {
        b <- field("bucket"); r <- field("rows"); kp <- field("kept")
        w <- field("wallMs"); f <- field("fingerprint")
      } yield BucketEntry(b.toInt, r.toLong, kp.toLong, w.toLong, f)
    }

  def writeManifest(out: String, entries: Seq[BucketEntry]): Unit = {
    val json = entries
      .sortBy(_.bucket)
      .map(e => s"""{"bucket": ${e.bucket}, "rows": ${e.rows}, "kept": ${e.kept}, """ +
        s""""wallMs": ${e.wallMs}, "fingerprint": "${e.fingerprint}"}""")
      .mkString("[\n", ",\n", "\n]")
    Files.createDirectories(Paths.get(out))
    val tmp = Paths.get(out, s"_graft_manifest.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(out), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // snapshot history — the Iceberg-snapshot / reference-undo-history
    // analog (src/CorpusAid.py:541-567): every commit appends an immutable
    // numbered manifest version under _graft_snapshots/
    val snapDir = Paths.get(out, "_graft_snapshots")
    Files.createDirectories(snapDir)
    val v = snapshots(out).lastOption.getOrElse(0) + 1
    Files.write(snapDir.resolve(f"v$v%05d.json"),
      json.getBytes(StandardCharsets.UTF_8))
  }

  /** Committed manifest versions, ascending. */
  def snapshots(out: String): Seq[Int] = {
    val dir = Paths.get(out, "_graft_snapshots")
    if (!Files.exists(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.substring(1, s.length - 5).toInt }
        .toSeq.sorted
      finally stream.close() // leaked directory fds exhaust the driver
    }
  }

  /** Lineage as of a given snapshot version (manifest time travel). */
  def manifestAt(out: String, version: Int): Seq[BucketEntry] = {
    val p = Paths.get(out, "_graft_snapshots", f"v$version%05d.json")
    if (!Files.exists(p)) return Nil
    val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    parseManifest(txt)
  }

  /** Run (or resume) the pipeline; returns the per-bucket lineage written in
    * this invocation (empty when everything was already committed). */
  def run(
      spark: SparkSession,
      turns: Dataset[Turn],
      outPath: String,
      nBuckets: Int = 32,
      cleanCfg: CleanConfig = CleanConfig.transcriptDefault,
      filterCfg: FilterConfig = FilterConfig()
  ): Seq[BucketEntry] = {
    val fp = fingerprint(cleanCfg, filterCfg, nBuckets)
    val allPrior = readManifest(outPath)
    val prior = allPrior.filter(_.fingerprint == fp)
    val committed = prior.map(_.bucket).toSet
    val pending = (0 until nBuckets).filterNot(committed)
    if (pending.isEmpty) return Nil

    // config change (fingerprint mismatch): the dynamic-partition write
    // below only replaces buckets THIS config produces — a shrink from 64
    // to 32 buckets would otherwise leave bucket=32..63 directories
    // readable as current output (stale data counted twice). Remove every
    // on-disk bucket directory the old config owned before rebuilding.
    if (allPrior.nonEmpty && prior.isEmpty) {
      val outDir = Paths.get(outPath)
      if (Files.exists(outDir)) {
        import scala.jdk.CollectionConverters._
        val stale = {
          val s = Files.list(outDir)
          try s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("bucket="))
            .toList
          finally s.close()
        }
        stale.foreach { d =>
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.delete)
          finally walk.close()
        }
      }
    }

    val t0 = System.nanoTime()

    val result = QualityFilter(spark, turns, cleanCfg, filterCfg)
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(nBuckets)).cast("int"))
      .filter(col("bucket").isin(pending: _*))

    // ONE job: the lineage counts ride the write itself via observe()
    // (CollectMetrics on the executors) — no second scan over the freshly
    // written output (VERDICT r1 finding #4; at 100-TB output a read-back
    // doubles the job)
    val obs = org.apache.spark.sql.Observation(s"graft_lineage_$fp")
    val metricCols = pending.flatMap { b =>
      Seq(
        count(when(col("bucket") === b, 1)).as(s"rows_$b"),
        count(when(col("bucket") === b && col("keep"), 1)).as(s"kept_$b"))
    }
    // Cluster the output by bucket before the write: without this every
    // write task emits a file into every bucket directory (tasks × buckets
    // small files — 512 here; at 1000 buckets a commit storm). Hash
    // repartitioning on the bucket key sends each bucket to exactly ONE
    // task → exactly one compact file per bucket, the layout the manifest
    // models. 4× partition oversubscription because Murmur3 mod n is not a
    // bijection on 0..n-1 — at n partitions several buckets would collide
    // into one task (serializing their writes) while others run empty; at
    // 4n the expected max load is 1-2 buckets/task. (repartitionByRange
    // would be exact but pays a boundary-sampling pass over the upstream
    // pipeline.) A deployment whose buckets exceed one task's output would
    // hash on (bucket, intra-bucket salt) for k files per bucket.
    result
      .repartition(nBuckets * 4, col("bucket"))
      .observe(obs, metricCols.head, metricCols.tail: _*)
      .write
      .mode("overwrite")
      // per-writer option, NOT spark.conf.set: a session-wide flip would
      // silently change overwrite semantics for every later write in the
      // caller's session
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(outPath)

    val wallMs = (System.nanoTime() - t0) / 1000000
    val observed = obs.get
    // zero-row buckets get a commit marker from the same observed row
    val fresh = pending.map { b =>
      BucketEntry(b,
        observed(s"rows_$b").asInstanceOf[Long],
        observed(s"kept_$b").asInstanceOf[Long],
        wallMs, fp)
    }
    writeManifest(outPath, prior ++ fresh)
    fresh
  }

  /** Lineage metrics as a DataFrame (the "metrics table"). */
  def metrics(spark: SparkSession, outPath: String): DataFrame = {
    import spark.implicits._
    readManifest(outPath).toDF()
  }
}
