package graft

import graft.model.CleanConfig

/** Writes the committed PER-DOCUMENT golden table for the q13/q28 oracles:
  * every sf0.01 document through the DRIVER-SIDE kernels — language-ID
  * (`LangId.model.classify`) and the q28 tokenize/stop/lowercase chain
  * (`CleanPipeline.kernelChain`) — one parquet file the DuckDB oracle
  * reads. Pins the SPEC against the distributed execution forms (the q13
  * broadcast-model UDF and the q28 `CleanText` codegen expression): if
  * either path drifts from the sequential kernels, the driver's gate goes
  * red. Run once via `sbt "Test/runMain graft.GoldenDocs"`; regenerate
  * ONLY on an intentional model/tokenizer spec change, with the commit
  * message naming it. */
object GoldenDocs {
  val path = "src/test/resources/golden/docs_sf001_golden.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)

    val chain = graft.pipeline.CleanPipeline.kernelChain(
      CleanConfig(wordTokenization = true, removeStopWords = true,
        lowercase = true))
    val rows = docs.map { case (id, text) =>
      if (text == null) (id, "und", null: String)
      else (id, graft.quality.LangId.model.classify(text)._1, chain(text))
    }

    GoldenIo.writeSingleParquet(
      rows.toSeq.toDF("doc_id", "pred_lang", "tokens"), path)
    println(s"wrote ${rows.length} golden docs to $path")
    spark.stop()
  }
}
