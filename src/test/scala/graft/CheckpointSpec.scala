package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.run.{CheckpointedRun, QualityFilter}

class CheckpointSpec extends AnyFunSuite with SparkTestBase {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_ckpt_").toString
    d
  }

  private val nBuckets = 8

  test("full run commits every bucket; output equals direct pipeline") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 200, megaTurns = 300)
    val fresh = CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(fresh.map(_.bucket).sorted === (0 until nBuckets))
    assert(fresh.map(_.rows).sum === turns.count())

    val direct = QualityFilter(spark, turns)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getBoolean(2), r.getString(3))).toMap
    val written = spark.read.parquet(out)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getBoolean(2), r.getString(3))).toMap
    assert(written === direct)
  }

  test("resume recomputes ONLY missing buckets, byte-identical result") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 200, megaTurns = 300)
    val all = CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(all.size === nBuckets)
    val before = spark.read.parquet(out)
      .select("conv_id", "turn_idx", "scrubbed_text").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap

    // simulate a crash that lost buckets 2 and 5 before their commit
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(e => Set(2, 5)(e.bucket)))
    Seq(2, 5).foreach { b =>
      val dir = Paths.get(out, s"bucket=$b")
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

    // record mtimes of a surviving bucket's files
    val survivor = Files.walk(Paths.get(out, "bucket=0")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    val mtimes = survivor.map(p => p -> Files.getLastModifiedTime(p)).toMap

    val fresh = CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(fresh.map(_.bucket).sorted === Seq(2, 5), s"recomputed: ${fresh.map(_.bucket)}")

    // surviving buckets untouched (no duplicate work)
    survivor.foreach(p => assert(Files.getLastModifiedTime(p) === mtimes(p)))

    val after = spark.read.parquet(out)
      .select("conv_id", "turn_idx", "scrubbed_text").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(after === before)

    // idempotent: nothing pending on a third run
    assert(CheckpointedRun.run(spark, turns, out, nBuckets).isEmpty)
  }

  test("lineage counts ride the write (observe): no output read-back job") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 150, megaTurns = 100)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val outputScanned = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // any RDD in any stage whose name/scope mentions the output path
        // would mean a read-back of what we just wrote
        if (e.stageInfos.exists(_.rddInfos.exists(r =>
            r.name != null && r.name.contains(out))))
          outputScanned.set(true)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fresh =
      try CheckpointedRun.run(spark, turns, out, nBuckets)
      finally {
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(!outputScanned.get(), "run() must not re-read its own output")
    // write + AQE query stages only — the old read-back added 2+ more jobs
    assert(jobs.get() <= 3, s"expected one write (<=3 AQE jobs), got ${jobs.get()}")

    // the observed metrics equal the ground truth from a direct run
    val direct = QualityFilter(spark, turns)
    val keptTrue = direct.filter(col("keep")).count()
    assert(fresh.map(_.rows).sum === turns.count())
    assert(fresh.map(_.kept).sum === keptTrue)
  }

  test("config change invalidates the checkpoint (fingerprint mismatch)") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 50, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val fresh = CheckpointedRun.run(spark, turns, out, nBuckets,
      filterCfg = graft.quality.FilterConfig(minChars = 10))
    assert(fresh.size === nBuckets, "new fingerprint must recompute everything")
  }

  test("shrinking nBuckets leaves NO stale bucket directories behind") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 80, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets = 8)
    val rows8 = spark.read.parquet(out).count()

    // re-run same path with FEWER buckets: old bucket=4..7 dirs must go,
    // or their rows would be read twice (once stale, once re-hashed)
    CheckpointedRun.run(spark, turns, out, nBuckets = 4)
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("bucket=")).toSeq
    assert(dirs.sorted === (0 until 4).map(b => s"bucket=$b"),
      s"stale bucket dirs survived: $dirs")
    assert(spark.read.parquet(out).count() === rows8,
      "row count must be unchanged after re-bucketing (no duplicates)")
  }

  test("manifest snapshots: every commit appends an immutable version") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 60, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(CheckpointedRun.snapshots(out) === Seq(1))
    // simulate a lost bucket + resume: a second snapshot appears
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(_.bucket == 3))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(out, "bucket=3"))
      .iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val versions = CheckpointedRun.snapshots(out)
    assert(versions.size === 3) // initial + truncated + resumed
    // time travel: version 1 already had all buckets; truncated v2 lacks 3
    assert(CheckpointedRun.manifestAt(out, 1).map(_.bucket).sorted === (0 until nBuckets))
    assert(!CheckpointedRun.manifestAt(out, 2).exists(_.bucket == 3))
    assert(CheckpointedRun.manifestAt(out, versions.last).map(_.bucket).sorted
      === (0 until nBuckets))
  }

  test("readAt: data time travel serves exactly a snapshot's buckets, pruned") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 60, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val full = spark.read.parquet(out)
      .select("conv_id", "turn_idx", "keep").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    // lose bucket 3 (manifest v2), resume (v3)
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(_.bucket == 3))
    Files.walk(Paths.get(out, "bucket=3"))
      .iterator().asScala.toSeq.reverse.foreach(Files.delete)
    CheckpointedRun.run(spark, turns, out, nBuckets)

    val v2 = CheckpointedRun.readAt(spark, out, 2)
    // partition pruning, not a post-scan filter: the bucket IN (...) predicate
    // must land in the scan's PartitionFilters (inputFiles reflects the
    // pre-pruning FileIndex, so the plan is the thing to assert on)
    val scanPlan = v2.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters") && scanPlan.contains("bucket"),
      s"expected bucket partition pruning in scan:\n$scanPlan")
    val got = v2.select("conv_id", "turn_idx", "keep").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    // expected membership derived from the snapshot manifest itself
    val v2Buckets = CheckpointedRun.manifestAt(out, 2).map(_.bucket).toSet
    val byBucket = spark.read.parquet(out)
      .select(col("conv_id"), col("bucket")).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val want = full.filter { case ((cid, _), _) => v2Buckets(byBucket(cid)) }
    assert(got === want)
    assert(got.size < full.size, "the truncated snapshot must be smaller")
    // manifest row counts agree with what the snapshot read returns
    assert(CheckpointedRun.manifestAt(out, 2).map(_.rows).sum === got.size)
    // latest snapshot == current table
    val latest = CheckpointedRun.snapshots(out).last
    assert(CheckpointedRun.readAt(spark, out, latest).count() === full.size)
  }

  test("readChangedBetween: incremental scan returns exactly the resume delta") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 60, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(e => Set(2, 5)(e.bucket)))
    Seq(2, 5).foreach { b =>
      Files.walk(Paths.get(out, s"bucket=$b"))
        .iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    CheckpointedRun.run(spark, turns, out, nBuckets)

    // v2 -> v3: exactly the two recomputed buckets
    val delta = CheckpointedRun.readChangedBetween(spark, out, 2, 3)
    val deltaBuckets = delta.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(deltaBuckets === Seq(2, 5))
    assert(delta.count() ===
      CheckpointedRun.manifestAt(out, 3)
        .filter(e => Set(2, 5)(e.bucket)).map(_.rows).sum)
    // pruned, not post-filtered
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))

    // v1 -> v2 (truncation only): nothing added, empty frame, table schema
    val empty = CheckpointedRun.readChangedBetween(spark, out, 1, 2)
    assert(empty.count() === 0)
    assert(empty.columns.contains("conv_id"))

    // v1 -> v3: buckets 2/5 were recommitted under the SAME fingerprint,
    // so the determinism invariant excludes them — a consumer at v1 has
    // nothing new to process after a crash-resume
    assert(CheckpointedRun.readChangedBetween(spark, out, 1, 3).count() === 0)

    // ordering guard
    intercept[IllegalArgumentException] {
      CheckpointedRun.readChangedBetween(spark, out, 3, 2)
    }
  }

  test("history + expireSnapshots: metadata table and retention maintenance") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 60, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(_.bucket == 3))
    Files.walk(Paths.get(out, "bucket=3"))
      .iterator().asScala.toSeq.reverse.foreach(Files.delete)
    CheckpointedRun.run(spark, turns, out, nBuckets)

    // .snapshots metadata table: totals per version, metadata-scale
    val h = CheckpointedRun.history(spark, out)
      .orderBy("version")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(h.map(_._1).toSeq === Seq(1, 2, 3))
    assert(h(0)._2 === nBuckets && h(2)._2 === nBuckets)
    assert(h(1)._2 === nBuckets - 1)
    assert(h(0)._3 === turns.count() && h(2)._3 === h(0)._3)
    assert(h(1)._3 < h(0)._3)
    assert(h(0)._4 === h(2)._4) // determinism: kept totals match across resume

    // retention: keep only the newest snapshot
    val dropped = CheckpointedRun.expireSnapshots(out, keepLast = 1)
    assert(dropped === Seq(1, 2))
    assert(CheckpointedRun.snapshots(out) === Seq(3))
    // an expired version is gone with the standard loud error; the
    // surviving one still reads, and the live data is untouched
    val gone = intercept[IllegalArgumentException] {
      CheckpointedRun.readAt(spark, out, 2)
    }
    assert(gone.getMessage.contains("v2"))
    assert(CheckpointedRun.readAt(spark, out, 3).count() === turns.count())
    intercept[IllegalArgumentException] {
      CheckpointedRun.expireSnapshots(out, keepLast = 0)
    }
  }

  test("readAt: nonexistent version and cross-config snapshots fail loudly") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 40, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val missing = intercept[IllegalArgumentException] {
      CheckpointedRun.readAt(spark, out, 99)
    }
    assert(missing.getMessage.contains("v99"))
    // a config change rewrites every bucket under a new fingerprint: the
    // old snapshot's data is gone in the emulation, so serving it would be
    // silent corruption — readAt must refuse
    CheckpointedRun.run(spark, turns, out, nBuckets,
      filterCfg = graft.quality.FilterConfig(minChars = 7))
    val stale = intercept[IllegalArgumentException] {
      CheckpointedRun.readAt(spark, out, 1)
    }
    assert(stale.getMessage.contains("fingerprint"))
  }

  test("1024-bucket layout: lineage CollectMetrics stays O(1) in bucket count") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 30, megaTurns = 0)

    val metricsLines = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.executedPlan.toString.linesIterator
          .filter(_.contains("CollectMetrics"))
          .foreach(metricsLines.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    val fresh =
      try {
        val r = CheckpointedRun.run(spark, turns, out, nBuckets = 1024)
        Thread.sleep(1000) // listener events are async — let them drain
        r
      } finally spark.listenerManager.unregister(ql)

    assert(fresh.size === 1024)
    assert(fresh.map(_.rows).sum === turns.count())
    assert(fresh.map(_.kept).sum ===
      QualityFilter(spark, turns).filter(col("keep")).count())
    import scala.jdk.CollectionConverters._
    val cm = metricsLines.asScala.filter(_.contains("rows_map"))
    assert(cm.nonEmpty, s"no lineage CollectMetrics captured: $metricsLines")
    // two map-typed aggregates regardless of bucket count — the old
    // per-bucket formulation put 2048 count(when) expressions on this line
    cm.foreach { line =>
      assert(line.length < 2000, s"CollectMetrics grew with buckets:\n$line")
      assert(line.contains("kept_map"))
    }
  }

  test("manifest + output round-trip through an explicit file:// URI (Hadoop FS)") {
    val rawDir = freshDir()
    val out = "file://" + rawDir
    val turns = TranscriptGen.dataset(spark, 60, megaTurns = 0)
    val fresh = CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(fresh.size === nBuckets)
    // manifest written through the FileSystem API lands on the local disk
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(rawDir, "_graft_manifest.json")))
    assert(CheckpointedRun.readManifest(out).size === nBuckets)
    assert(CheckpointedRun.snapshots(out) === Seq(1))
    // resume through the URI: a lost bucket is recomputed, others untouched
    val manifest = CheckpointedRun.readManifest(out)
    CheckpointedRun.writeManifest(out, manifest.filterNot(_.bucket == 1))
    val again = CheckpointedRun.run(spark, turns, out, nBuckets)
    assert(again.map(_.bucket) === Seq(1))
    assert(spark.read.parquet(out).count() === turns.count())
  }

  test("lineage metrics table is queryable") {
    val out = freshDir()
    val turns = TranscriptGen.dataset(spark, 50, megaTurns = 0)
    CheckpointedRun.run(spark, turns, out, nBuckets)
    val m = CheckpointedRun.metrics(spark, out)
    assert(m.count() === nBuckets)
    assert(m.agg(sum("rows")).head.getLong(0) === turns.count())
    assert(m.filter(col("kept") > 0).count() > 0)
  }
}
