package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * (forced through the noop sink so column pruning cannot skip the work) and
  * measures flagship pipeline throughput in turns/sec. Emits ONE JSON line:
  * {"metric":"total","value":<sum sec>,"unit":"sec","queries":{...},
  *  "sf":"...","flagship_turns":N,"flagship_sec":s,"turns_per_sec":r}.
  */
object Bench {

  def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JIT/codegen warmup on the smallest sf
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // flagship throughput: full pipeline over the sf-scaled synthetic table,
    // staged to parquet first (untimed) — production reads a table scan
    import spark.implicits._
    val sf = SparkEntry.sfOf(sfDir)
    // 4x the query-battery scale: the flagship number is a THROUGHPUT
    // metric and needs enough rows to amortize fixed job overheads
    // (BASELINE.md documents the 2.7M-turn reference measurements)
    val nConvs = math.max(400L, (sf * 400000).toLong)
    val stage = Scaling.stagedInput(spark, nConvs)
    val turns = spark.read.parquet(stage).as[graft.model.Turn]
    val nTurns = turns.count()
    val t0 = System.nanoTime()
    force(graft.run.QualityFilter(spark, turns))
    val flagshipSec = (System.nanoTime() - t0) / 1e9
    val tps = nTurns / flagshipSec

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"flagship_turns":$nTurns,"flagship_sec":$flagshipSec%.3f,"turns_per_sec":$tps%.1f}""")
    spark.stop()
  }
}
