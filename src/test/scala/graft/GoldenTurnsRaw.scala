package graft

import graft.gen.TranscriptGen

/** Writes the committed RAW transcript dump for the q87/q88/q89 oracles:
  * the sf0.01 synthetic battery (the exact `SparkEntry.synthTurns` shape —
  * 1000 convs, 5000-turn mega, seed 42) generated SEQUENTIALLY on the
  * driver ([[TranscriptGen.local]]) with the full north-rule input schema
  * (conv_id, turn_idx, role, text, tool, ts). Unlike the pinned-output
  * goldens, this file is an INPUT pin: the DuckDB oracle recomputes the
  * conversation-structure audit/repair/assembly from it with its own
  * window engine, so the distributed results are checked against an
  * independent implementation — and the distributed generator is checked
  * against the sequential one for free (a mismatch would fail the oracle
  * on every conversation). Run once via
  * `sbt "Test/runMain graft.GoldenTurnsRaw"`; regenerate ONLY on an
  * intentional generator change, with the commit message naming it. */
object GoldenTurnsRaw {
  // mirror of SparkEntry.synthTurns at sf0.01
  val NConvs = 1000L
  val Mega = 5000

  val path = "src/test/resources/golden/turns_raw_sf001.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val turns = TranscriptGen.local(NConvs, megaTurns = Mega)
    GoldenIo.writeSingleParquet(turns.toDF(), path)
    println(s"wrote ${turns.size} raw turns to $path")
    spark.stop()
  }
}
