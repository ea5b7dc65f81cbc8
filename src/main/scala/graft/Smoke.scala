package graft

import org.apache.spark.sql.SparkSession

/** Local smoke drive of the driver contract: runs SparkEntry.entry and
  * prints row count + a sample, mirroring the driver's t1 check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.show(5, truncate = 60)
    println("[smoke] plan:")
    df.explain("formatted")
    spark.stop()
  }
}
