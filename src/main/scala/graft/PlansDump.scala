package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-6 evidence artifact: dump `.explain("formatted")` of named queries
  * to individual files (plans/r06/<query>_<tag>.txt) so before/after plan
  * claims in OPTIMIZATION_r06.md are checkable without running Spark.
  *
  * Usage: sbt "runMain graft.PlansDump <tag> <outDir> <q1,q2,...> [sfDir]"
  * The plan is the FINAL (post-AQE) plan: each query is executed (collect)
  * before explaining, exactly like graft.Plans.
  */
object PlansDump {

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val all = SparkEntry.queries
    names.foreach { prefix =>
      all.keys.filter(_.startsWith(prefix)).toSeq.sorted.foreach { name =>
        try {
          val df = all(name)(spark, sfDir)
          df.collect() // finalize AQE
          val txt = df.queryExecution.explainString(
            ExplainMode.fromString("formatted"))
          val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
          java.nio.file.Files.writeString(p, txt)
          println(s"[plans] wrote $p")
        } catch {
          case e: Throwable => System.err.println(s"[plans] $name FAILED: $e")
        } finally graft.run.Materialize.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
