package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Shared helper for the Golden* fixture writers: a DataFrame to ONE
  * committed parquet FILE (Spark writes a directory of parts; fixtures
  * want a single reviewable file at a stable path). */
object GoldenIo {
  def writeSingleParquet(df: DataFrame, path: String): Unit = {
    val tmp = Files.createTempDirectory("graft_golden_").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) {
        Files.move(p, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
        moved = true
      }
    }
    require(moved, "no parquet part file produced")
  }
}
