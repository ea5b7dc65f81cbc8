package graft.run

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.model.Turn

/** The production input-table contract: conv_id-bucketed, (conv_id,
  * turn_idx)-sorted storage. Reading such a table satisfies the pipeline's
  * required distribution AND ordering up front, so the flagship job runs
  * with ZERO shuffles (PlanAuditSpec asserts this).
  *
  * In this sandbox the catalog is Spark's in-memory/derby-free catalog +
  * parquet with bucketBy/sortBy metadata; on a real deployment the same
  * role is played by an Iceberg table with a `bucket(conv_id, N)` partition
  * transform and a sort order — drop-in, no plan change (SURVEY.md §7.1).
  */
object TranscriptTable {

  /** Write the bucketed+sorted table (one file per bucket so the reader can
    * use the sort order). */
  def writeBucketed(
      turns: Dataset[Turn],
      table: String,
      buckets: Int = 32
  ): Unit =
    turns
      .repartition(buckets, turns("conv_id"))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): Dataset[Turn] = {
    import spark.implicits._
    spark.table(table).as[Turn]
  }
}
