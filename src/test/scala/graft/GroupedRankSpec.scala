package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupedTopK
import graft.sample.GroupedRank

/** Equivalence proofs for the scalable per-group sequence machinery against
  * the single-task window forms they replace (grouped row_number, ntile,
  * grouped top-k). */
class GroupedRankSpec extends AnyFunSuite with SparkTestBase {

  // skewed groups (one dominant), plus a null-group row set and duplicate
  // scores to exercise tie-breaking
  private def mkDocs = {
    import spark.implicits._
    val r = new graft.gen.TranscriptGen.Rng(7171L)
    (0 until 2000).map { i =>
      val src =
        if (i % 11 == 0) null
        else if (r.nextInt(10) < 6) "web"
        else s"s${r.nextInt(5)}"
      (i.toLong, src, r.nextInt(50).toLong)
    }.toDF("id", "source", "score").repartition(7)
  }

  test("GroupedRank.rank == grouped window row_number (asc and desc)") {
    import spark.implicits._
    val docs = mkDocs
    for (ord <- Seq(Seq(col("score"), col("id")), Seq(col("score").desc, col("id")))) {
      val got = GroupedRank.rank(spark, docs, col("source"), ord)
        .select(col("id"), col("group_rank"), col("group_count"))
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      val w = Window.partitionBy("source").orderBy(ord: _*)
      val cw = Window.partitionBy("source")
      val want = docs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(cw))
        .select(col("id"), col("rn"), col("cnt"))
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got === want)
    }
  }

  test("GroupedRank.ntileExpr == ntile(n) for every group size 1..13, n in {1,2,4,5}") {
    import spark.implicits._
    // one group per size so every (N mod n) residue class is covered
    val rows = (1 to 13).flatMap(sz => (1 to sz).map(i => (s"g$sz", sz * 100 + i)))
    val df = rows.toDF("g", "id").repartition(5)
    for (n <- Seq(1, 2, 4, 5)) {
      val got = GroupedRank.rank(spark, df, col("g"), Seq(col("id")))
        .withColumn("tier", GroupedRank.ntileExpr(col("group_rank"), col("group_count"), n))
        .select(col("id"), col("tier")).as[(Int, Int)].collect().toMap
      val want = df
        .withColumn("tier", ntile(n).over(Window.partitionBy("g").orderBy("id")))
        .select(col("id"), col("tier")).as[(Int, Int)].collect().toMap
      assert(got === want, s"n=$n")
    }
  }

  test("GroupedRank.prefixSum == grouped window running sum; scalable Pack == Pack") {
    import spark.implicits._
    import graft.operators.Pack
    val r = new graft.gen.TranscriptGen.Rng(909L)
    val docs = (0 until 3000).map { i =>
      (i.toLong, s"s${r.nextInt(4)}", s"d${r.nextInt(3)}", 1L + r.nextInt(40))
    }.toDF("id", "source", "shard", "w").repartition(7)

    // prefix sum vs the window form (single group)
    val got = graft.sample.GroupedRank
      .prefixSum(spark, docs, col("source"), Seq(col("id")), col("w"))
      .select(col("id"), col("group_prefix_sum"))
      .as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("source").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("c", sum(col("w")).over(w))
      .select(col("id"), col("c")).as[(Long, Long)].collect().toMap
    assert(got === want)

    // scalable pack == window pack, single- and multi-column groups
    for (groups <- Seq(Seq("source"), Seq("source", "shard"))) {
      val a = Pack.contiguous(docs, groups, "id", "w", budget = 64L)
        .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
      val b = Pack.contiguousScalable(spark, docs, groups, "id", "w", budget = 64L)
        .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
      assert(a === b, s"groups=$groups")
    }
  }

  test("GroupedTopK == grouped window top-k, including k > group size") {
    import spark.implicits._
    val docs = mkDocs.filter(col("source").isNotNull)
    for (k <- Seq(1, 5, 5000)) {
      val got = GroupedTopK
        .topK(docs, groupCol = "source", scoreCol = "score", tieCol = "id", k = k)
        .select(col("source"), col("rk"), col("id"))
        .as[(String, Int, Long)].collect().toSet
      val w = Window.partitionBy("source").orderBy(col("score").desc, col("id"))
      val want = docs
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("source"), col("rk"), col("id"))
        .as[(String, Int, Long)].collect().toSet
      assert(got === want, s"k=$k")
    }
  }

  test("GroupedTopK string ordering matches Spark SQL (UTF-8 binary, not UTF-16)") {
    import spark.implicits._
    // U+1F600 (surrogate pair, UTF-16: D83D DE00) vs U+E000: Java compareTo
    // ranks the emoji FIRST, Spark's UTF8String binary order ranks it LAST —
    // with k=1 a UTF-16 heap would evict the row the window keeps
    val rows = Seq(
      ("g", 1L, "😀"), ("g", 2L, ""), ("g", 3L, "abc"),
      ("h", 4L, "z😀"), ("h", 5L, "z"))
      .toDF("source", "id", "s").repartition(3)
    for (k <- Seq(1, 2); descFlag <- Seq(true, false)) {
      val got = GroupedTopK
        .topK(rows, "source", "s", "id", k = k, descending = descFlag)
        .select(col("source"), col("rk"), col("id"))
        .as[(String, Int, Long)].collect().toSet
      val ord = if (descFlag) col("s").desc else col("s").asc
      val want = rows
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(ord, col("id"))))
        .filter(col("rk") <= k)
        .select(col("source"), col("rk"), col("id"))
        .as[(String, Int, Long)].collect().toSet
      assert(got === want, s"k=$k desc=$descFlag")
    }
    // non-atomic order columns are rejected upfront, not at task time
    val bad = Seq(("g", 1L, Seq(1, 2))).toDF("source", "id", "arr")
    intercept[IllegalArgumentException] {
      GroupedTopK.topK(bad, "source", "arr", "id", k = 1)
    }
  }

  test("rank/prefixSum/EpochShuffle identical across pinning modes " +
    "(localCheckpoint vs reliable checkpoint)") {
    import spark.implicits._
    import graft.run.Materialize
    import graft.sample.EpochShuffle
    val docs = mkDocs
    def runAll(): (Seq[(Long, Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)]) = {
      val r = GroupedRank.rank(spark, docs, col("source"), Seq(col("score"), col("id")))
        .select(col("id"), col("group_rank"), col("group_count"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val p = GroupedRank.prefixSum(spark, docs, col("source"), Seq(col("id")), col("score"))
        .select(col("id"), col("group_prefix_sum"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val e = EpochShuffle.rank(spark, docs, EpochShuffle.lcgKey(col("id"), 3L), col("id"))
        .select(col("id"), col("shuffle_rank"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      (r, p, e)
    }
    val base = runAll()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    spark.conf.set(Materialize.ConfKey, dir)
    try {
      assert(runAll() === base)
      // the reliable mode actually wrote checkpoint state to the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Materialize.ConfKey)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("non-JSON-stable group keys (double) take the fallback path, same results") {
    import spark.implicits._
    assert(!GroupedRank.jsonStableKey(org.apache.spark.sql.types.DoubleType))
    assert(!GroupedRank.jsonStableKey(org.apache.spark.sql.types.TimestampType))
    assert(GroupedRank.jsonStableKey(org.apache.spark.sql.types.StringType))
    // -0.0 and 0.0 group as EQUAL under Spark grouping — the case the JSON
    // surrogate cannot represent and the fallback must get right
    val df = Seq(
      (1L, 0.0), (2L, -0.0), (3L, 1.5), (4L, 1.5), (5L, Double.NaN), (6L, Double.NaN))
      .toDF("id", "g").repartition(3)
    val got = GroupedRank.rank(spark, df, col("g"), Seq(col("id")))
      .select(col("id"), col("group_rank"), col("group_count"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Window.partitionBy("g").orderBy("id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
      .select(col("id"), col("rn"), col("cnt"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === want)
  }

  test("inputs already carrying output column names are rejected upfront") {
    import spark.implicits._
    val df = Seq((1L, "a", 2L)).toDF("id", "source", "group_rank")
    intercept[IllegalArgumentException] {
      GroupedRank.rank(spark, df, col("source"), Seq(col("id")))
    }
    val df2 = Seq((1L, "a", 2L)).toDF("id", "source", "group_prefix_sum")
    intercept[IllegalArgumentException] {
      GroupedRank.prefixSum(spark, df2, col("source"), Seq(col("id")), col("id"))
    }
  }

  test("Materialize.releaseAll frees pinned blocks after the final action") {
    import spark.implicits._
    val sc = spark.sparkContext
    // drain pins any earlier suite/test left behind so the count below is ours
    graft.run.Materialize.releaseAll(spark)
    val before = sc.getPersistentRDDs.size
    val pinned = graft.run.Materialize.pin(
      spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")))
    // data correct while pinned (the consumer's action)
    assert(pinned.agg(sum("v")).as[Long].head() === 999L * 1000L)
    assert(sc.getPersistentRDDs.size > before,
      "pin should register a persistent RDD (localCheckpoint blocks)")
    val released = graft.run.Materialize.releaseAll(spark)
    assert(released >= 1)
    assert(sc.getPersistentRDDs.size === before,
      "releaseAll should unpersist every tracked pin")
    // second release is a no-op, not an error
    assert(graft.run.Materialize.releaseAll(spark) === 0)
  }

  test("GroupedTopK ascending mode returns the k smallest") {
    import spark.implicits._
    val docs = mkDocs.filter(col("source").isNotNull)
    val got = GroupedTopK
      .topK(docs, "source", "score", "id", k = 3, descending = false)
      .select(col("source"), col("rk"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy("source").orderBy(col("score"), col("id"))
    val want = docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === want)
  }
}
