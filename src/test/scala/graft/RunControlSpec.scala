package graft

import scala.concurrent.Await
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.model.CleanConfig
import graft.run.{GraftSession, QualityFilter}

/** Operational controls for long jobs: cooperative cancellation (job groups)
  * and the per-row error quarantine side-channel. */
class RunControlSpec extends AnyFunSuite with SparkTestBase {

  test("a running flagship job can be cancelled mid-flight via the handle") {
    // large enough that the job is comfortably still running when we cancel
    val turns = TranscriptGen.dataset(spark, 60000, megaTurns = 500)
    val run = GraftSession.runCancellable(spark, "cancel-test") {
      QualityFilter(spark, turns).write.format("noop").mode("overwrite").save()
    }
    // wait until the group has a live job, then cancel it
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (run.handle.activeJobIds.isEmpty && !run.result.isCompleted &&
      System.nanoTime() < deadline) Thread.sleep(20)
    assert(run.handle.activeJobIds.nonEmpty || !run.result.isCompleted,
      "job never started")
    val t0 = System.nanoTime()
    run.handle.cancel("test requested")
    Await.ready(run.result, 60.seconds)
    val cancelSec = (System.nanoTime() - t0) / 1e9
    assert(run.result.value.get.isFailure, "cancelled run must fail its future")
    val msg = run.result.value.get.failed.get.toString.toLowerCase
    assert(msg.contains("cancel"), s"expected cancellation failure, got: $msg")
    assert(cancelSec < 30, s"cancellation took ${cancelSec}s — not cooperative")
  }

  test("poisoned row lands in quarantine with an error, not an exception") {
    import spark.implicits._
    // (a|b)+ is VALID regex (passes eager plan-time validation) but blows
    // the java.util.regex matcher stack on a long alternating input — the
    // classic per-row failure a 100-TB job must survive
    val poisonCfg = CleanConfig(regexPattern = "(a|b)+")
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val good = (1 to 20).map(i => graft.model.Turn(s"c$i", 0, "user",
      s"a perfectly ordinary english sentence number $i that is long enough to keep",
      "none", ts))
    val poisoned = graft.model.Turn("poison", 0, "user", "ab" * 200000, "none", ts)
    val turns = spark.createDataset(good :+ poisoned)

    val (clean, quarantined) = QualityFilter.quarantineSplit(
      spark, turns, cleanCfg = poisonCfg)

    val q = quarantined.collect()
    assert(q.length === 1, s"expected exactly the poisoned row, got ${q.length}")
    assert(q(0).getString(0) === "poison")
    assert(q(0).getString(4).contains("StackOverflowError"),
      s"error column: ${q(0).getString(4)}")
    // the good rows all survive and none carries an error column
    assert(clean.count() === 20)
    assert(!clean.columns.contains("error"))
  }

  test("error-tolerant mode matches the default pipeline when nothing throws") {
    import spark.implicits._
    val turns = TranscriptGen.dataset(spark, 80, megaTurns = 0)
    val base = QualityFilter(spark, turns)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getBoolean(2), r.getString(3)))).toMap
    val tolerant = QualityFilter(spark, turns, errorTolerant = true)
    assert(tolerant.filter(col("error").isNotNull).count() === 0)
    val tol = tolerant
      .select("conv_id", "turn_idx", "keep", "scrubbed_text").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getBoolean(2), r.getString(3)))).toMap
    assert(tol === base)
  }
}
