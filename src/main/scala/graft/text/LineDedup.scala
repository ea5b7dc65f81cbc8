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
  *   3. non-keeper instances (duplicate-mass-bounded) fold into one
  *      drop-position-set row per affected doc; every document is rebuilt
  *      IN PLACE by filtering its own split by index — document text never
  *      exchanges.
  * Mega-duplicate lines ("Sign in") hit only the aggregations (partial agg
  * absorbs the skew) and one AQE-skew-splittable join.
  *
  * Output: (idCol, cleaned, n_lines_removed); null text passes through.
  */
object LineDedup {

  /** Entry budget for broadcasting the duplicate-hash set in pass 2 (8-byte
    * keys → ≤ ~32 MB relation): below it the semi-join broadcasts and
    * unique lines never shuffle at all; above it the old shuffle tier runs
    * (hash-led keys, AQE-skew-splittable). Probe is a count on the pinned
    * pass-1 output (the TurnDedup/KnScorer probe-then-degrade pattern). */
  val DupHashBroadcastMax: Long = 4L << 20

  /** Row budget for broadcasting the per-doc drop-position table in pass 3
    * (docs that lose at least one line). */
  val DropSetBroadcastMax: Long = 2L << 20

  def dedup(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineLen: Int = 15,
      dupHashBroadcastMax: Long = DupHashBroadcastMax,
      dropSetBroadcastMax: Long = DropSetBroadcastMax
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
    val semiSide =
      if (dupHashes.count() <= dupHashBroadcastMax) broadcast(dupHashes)
      else dupHashes.hint("shuffle_hash")

    // pass 2: only the duplicate (+ hash-collision) mass shuffles as
    // strings; pinned — read twice (decision agg + instance join)
    val mass = Materialize.pin(
      lines
        .where(length(col("line")) >= minLineLen)
        .join(semiSide, xxhash64(col("line")) === col("h"), "left_semi"))
    val decisions = mass
      .groupBy("line")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("pos"))).as("keeper"))
      .where(col("n_occ") > 1)
      .select(col("line").as("_dline"),
        col("keeper").getField(idCol).as("_kid"),
        col("keeper").getField("pos").as("_kpos"))

    // pass 3 (r6 restructure — guide §8 "decide with small rows, move big
    // rows once"... here ZERO times): instead of re-joining every line
    // instance against the decisions and reassembling documents through a
    // corpus-wide string shuffle (the old groupBy(idCol) + array_sort
    // rebuild), compute only the DROPPED (id, pos) instances — bounded by
    // the duplicate mass — fold them to one position-set row per affected
    // doc, and rebuild each document IN PLACE with a per-row
    // filter-by-index over its own split. Document text never exchanges;
    // the only string shuffle anywhere is the duplicate mass in pass 2.
    val drops = mass
      .join(decisions, col("line") === col("_dline"))
      .where(!(col(idCol) === col("_kid") && col("pos") === col("_kpos")))
      .select(col(idCol), col("pos"))
    val dropSets = Materialize.pin(
      drops.groupBy(idCol)
        .agg(collect_set(col("pos")).as("_droppos")))
    val dropSide =
      if (dropSets.count() <= dropSetBroadcastMax) broadcast(dropSets)
      else dropSets
    Materialize.pin(
      docs.select(col(idCol), col(textCol))
        .join(dropSide, Seq(idCol), "left")
        .select(col(idCol),
          when(col(textCol).isNull, lit(null))
            .when(col("_droppos").isNull, col(textCol))
            .otherwise(array_join(
              filter(split(col(textCol), "\n", -1),
                (l, i) => !array_contains(col("_droppos"), i)),
              "\n")).as("cleaned"),
          coalesce(size(col("_droppos")), lit(0)).cast("int")
            .as("n_lines_removed")))
  }
}
