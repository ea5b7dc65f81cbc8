package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark startup dominates test
  * wall-time otherwise). Config mirrors the production session defaults:
  * small shuffle partition count sized to cores, AQE on. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_")
    // test-JVM temp hygiene: repeated suite runs otherwise accumulate one
    // warehouse dir per session in /tmp forever
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try org.apache.commons.io.FileUtils.deleteQuietly(wh.toFile)
      catch { case _: Throwable => () }
      ()
    }))
    SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
