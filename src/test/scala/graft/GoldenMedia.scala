package graft

/** Dumps the q22 media corpus BYTES (the deterministic BMP/WAV/Y4M
  * containers `Media.synthesize(n = 300, seed = 21)` produces — exactly the
  * corpus the q22 query decodes at the sf0.01 verify scale) to a local
  * parquet for `tools/gen_media_golden.py`, which re-parses the byte
  * layouts with an INDEPENDENT Python implementation (struct-module header
  * walks, no JVM code) and commits the per-media metadata golden the q22
  * oracle aggregates.
  *
  * Regeneration flow (only on an intentional container/synthesizer spec
  * change, commit message naming it):
  *   sbt "Test/runMain graft.GoldenMedia"
  *   python3 tools/gen_media_golden.py
  */
object GoldenMedia {
  val bytesPath = "/tmp/graft_media_bytes.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val media = graft.multimodal.Media.synthesize(spark, 300).toDF()
    GoldenIo.writeSingleParquet(media, bytesPath)
    println(s"wrote 300 media rows to $bytesPath")
    spark.stop()
  }
}
