package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media
import graft.text.Fingerprint

class MediaFingerprintSpec extends AnyFunSuite with SparkTestBase {

  test("media synth + decode: every row decodes valid with consistent meta") {
    import spark.implicits._
    val media = Media.synthesize(spark, 300)
    val metas = Media.withMeta(media)
      .select(col("kind"), col("meta.kind").as("decoded"), col("meta.valid"),
        col("meta.payloadBytes"), octet_length(col("content")).as("len"))
      .collect()
    assert(metas.length === 300)
    metas.foreach { r =>
      assert(r.getBoolean(2), "decode must report valid")
      assert(r.getString(0) === r.getString(1), "declared kind == decoded kind")
      assert(r.getInt(3) === r.getInt(4) - 17, "payload length consistent")
    }
  }

  test("decode stub never throws on garbage and flags invalid") {
    assert(!Media.decodeStub(null).valid)
    assert(!Media.decodeStub(Array[Byte](1, 2, 3)).valid)
    assert(!Media.decodeStub("NOPEnope_not_a_grft_header_x".getBytes).valid)
  }

  test("meta summary drops the binary before the shuffle") {
    import spark.implicits._
    val media = Media.synthesize(spark, 200)
    val summary = Media.metaSummary(media)
    val plan = summary.queryExecution.optimizedPlan.toString
    // the aggregate input must not carry the content column
    val aggLine = plan.linesIterator.find(_.contains("Aggregate")).getOrElse("")
    assert(!aggLine.contains("content"), s"binary column reached the aggregate: $aggLine")
    val rows = summary.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum === 200)
  }

  test("frame sampling: video frames sliced deterministically, non-video empty") {
    import spark.implicits._
    val media = Media.synthesize(spark, 100).collect()
    val video = media.find(_.kind == "video").get
    val meta = Media.decodeStub(video.content)
    val all = Media.frameSampleStub(video.content, 1)
    assert(all.size === meta.nFrames)
    val every2 = Media.frameSampleStub(video.content, 2)
    assert(every2.size === (meta.nFrames + 1) / 2)
    val audio = media.find(_.kind == "audio").get
    assert(Media.frameSampleStub(audio.content, 1).isEmpty)
  }

  test("media features feed the ANN operator end-to-end") {
    import spark.implicits._
    val media = Media.synthesize(spark, 200)
    val feats = Media.features(media)
    val queries = feats.as[(Long, Array[Float])].filter(_._1 < 3).collect()
    val topk = graft.sim.Ann.bruteForceTopK(spark, feats, queries, k = 5).collect()
    assert(topk.length === 15)
    // self-similarity must rank first with score ~1
    queries.foreach { case (qid, _) =>
      val self = topk.find(r => r.getLong(0) == qid && r.getInt(3) == 1).get
      assert(self.getLong(1) === qid)
      assert(math.abs(self.getDouble(2) - 1.0) < 1e-5)
    }
  }

  test("winnowing fingerprints: shared passage detected, unrelated not") {
    val base = "the committee approved the budget after a short discussion about energy markets and regional growth"
    val plagiarized = "INTRO TEXT. " + base + " AND A DIFFERENT ENDING APPENDED"
    val unrelated = "completely different content with no overlap whatsoever in any passage of this sentence"
    val fb = Fingerprint.winnow(base)
    val fp = Fingerprint.winnow(plagiarized)
    val fu = Fingerprint.winnow(unrelated)
    assert(Fingerprint.containment(fb, fp) > 0.7,
      s"containment = ${Fingerprint.containment(fb, fp)}")
    assert(Fingerprint.containment(fb, fu) < 0.05)
    // deterministic
    assert(Fingerprint.winnow(base).toSeq === fb.toSeq)
  }

  test("rolling hash windows: winnow output is subset of all k-gram hashes") {
    val t = "some reasonably long text for rolling hash window checks here"
    val all = Fingerprint.rollingHashes(t, 5).toSet
    assert(Fingerprint.winnow(t, 5, 4).forall(all.contains))
  }
}
