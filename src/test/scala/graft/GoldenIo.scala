package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Shared helper for the Golden* fixture writers: a DataFrame to ONE
  * committed parquet FILE (Spark writes a directory of parts; fixtures
  * want a single reviewable file at a stable path). */
object GoldenIo {
  def writeSingleParquet(df: DataFrame, path: String): Unit = {
    val tmp = Files.createTempDirectory("graft_golden_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.iterator().asScala.find(_.toString.endsWith(".parquet"))
      finally listing.close()
    require(part.isDefined, "no parquet part file produced")
    Files.move(part.get, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    // clean the _SUCCESS/.crc leftovers (dev-time tool, but no /tmp litter)
    val walk = Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()
  }
}
