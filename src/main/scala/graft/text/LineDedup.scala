package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.run.Materialize

/** C4-style global line-level deduplication (Raffel et al. 2020 §2.2 clean
  * "we removed all but one of any three-sentence span occurring more than
  * once", applied here at line granularity like the public c4/mC4
  * pipelines): every line whose exact text occurs more than once in the
  * WHOLE corpus is removed everywhere except its first occurrence in
  * (doc_id, line_pos) order. Lines shorter than `minLineLen` chars are
  * never candidates (always kept) — the C4 guard against deduplicating
  * trivial connective lines.
  *
  * Fully declarative (built-in Catalyst expressions only — no UDFs, whole
  * plan codegen-able), with the [[SubstrDedup]] two-pass trick so UNIQUE
  * lines — the overwhelming majority of a web corpus — never shuffle as
  * strings:
  *   1. (hash, count) aggregation over 8-byte line hashes (map-side
  *      combined, skew-safe); hashes with count > 1 form the distributed
  *      duplicate-candidate set — never collected to the driver.
  *   2. candidate line INSTANCES (the duplicate mass only) semi-join that
  *      hash set, then group BY LINE STRING (hash collisions resolved
  *      exactly: a collided-but-unique string gets count 1 and is kept)
  *      computing count and keeper = min(struct(doc_id, pos)).
  *   3. instances join decisions back; non-candidates are kept by
  *      construction; documents reassemble with one groupBy(doc_id) using
  *      array_sort over (pos, line) structs.
  * Mega-duplicate lines ("Sign in") hit only the aggregations (partial agg
  * absorbs the skew) and one AQE-skew-splittable join.
  *
  * Output: (idCol, cleaned, n_lines_removed); null text passes through.
  */
object LineDedup {

  def dedup(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineLen: Int = 15
  ): DataFrame = {
    val lines = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))

    // pass 1: duplicate-candidate hashes, kept distributed
    val dupHashes = Materialize.pin(
      lines
        .where(length(col("line")) >= minLineLen)
        .groupBy(xxhash64(col("line")).as("h"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
        .select("h"))

    // pass 2: only the duplicate mass shuffles as strings
    val candidates = lines
      .where(length(col("line")) >= minLineLen)
      .join(dupHashes.hint("shuffle_hash"),
        xxhash64(col("line")) === col("h"), "left_semi")
    val decisions = candidates
      .groupBy("line")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("pos"))).as("keeper"))
      .where(col("n_occ") > 1)
      .select(col("line").as("_dline"),
        col("keeper").getField(idCol).as("_kid"),
        col("keeper").getField("pos").as("_kpos"))

    // pass 3: per-instance keep decision + document reassembly
    val kept = lines
      .join(decisions, col("line") === col("_dline"), "left")
      .where(col("_dline").isNull ||
        (col(idCol) === col("_kid") && col("pos") === col("_kpos")))
      .select(col(idCol), col("pos"), col("line"))
    val rebuilt = kept
      .groupBy(idCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("cleaned"),
        // removed = original line count − kept line count, via max pos + 1
        // of the ORIGINAL doc minus kept count… computed below via join
        count(lit(1)).as("_n_kept"))

    val nLines = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        (size(split(col(textCol), "\n", -1))).as("_n_lines"))
    Materialize.pin(
      docs.select(col(idCol))
        .join(nLines, Seq(idCol), "left")
        .join(rebuilt, Seq(idCol), "left")
        .select(col(idCol),
          // text was null -> null; every line removed -> empty string
          when(col("_n_lines").isNull, lit(null))
            .otherwise(coalesce(col("cleaned"), lit(""))).as("cleaned"),
          coalesce(col("_n_lines") - coalesce(col("_n_kept"), lit(0L)),
            lit(0L)).cast("int").as("n_lines_removed")))
  }
}
