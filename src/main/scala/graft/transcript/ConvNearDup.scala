package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-grain near-duplicate detection — the transcript form of
  * document near-dedup (dedup.MinHashLSH / dedup.NgramJaccard operate on a
  * flat text column; a TRANSCRIPT duplicate is a whole conversation that
  * repeats another one turn-for-turn with small edits: resampled agent
  * runs, A/B replays, re-ingested sessions).
  *
  * Unit of similarity: the ORDERED turn-text k-shingle — MD5 of k
  * consecutive turn texts joined on  (order-sensitive, so two
  * conversations built from the same reply pool in a different order do
  * NOT match). Per conversation the shingle set is deduplicated (set
  * semantics); similarity is exact Jaccard over those sets, reported for
  * pairs at or above `tau`.
  *
  * This is the EXACT tier (the NgramJaccard posture, conversation grain):
  * an inverted shingle→conv index joined with itself, pair co-occurrence
  * counts, sizes joined back, one division. MD5 (128-bit) keys make hash
  * collisions ignorable even at 10^12 turns (the Lee et al. 2022 choice
  * for the same reason) AND are replayable bit-for-bit by DuckDB's own
  * md5() — the oracle recomputes the whole operator from the raw dump with
  * no committed intermediate.
  *
  * Scale guards:
  *   - `maxBucket` drops shingles present in more than that many
  *     conversations BEFORE pairing (a stop-shingle: a greeting turn
  *     sequence shared by 10^6 conversations would otherwise emit 10^12
  *     candidate pairs). The cap is part of the operator's SPEC — the
  *     oracle replays it with the same HAVING bound, so the result stays
  *     exactly defined, and dropped mass is auditable from the shingle
  *     index. At 100 TB the candidate join shuffles only (16-byte key,
  *     conv ids); conversation TEXT never reaches the pair stage.
  *   - Conversations with fewer than k turns have no shingles and are
  *     structurally excluded (they belong to the exact-dup tier — q90).
  *
  * The generator never repeats a conversation (each convIdx seeds its own
  * RNG stream), so the fixture rule applies: [[inject]] unions a
  * deterministic near-copy of every 17th conversation — every 11th turn
  * edited — exercising jaccard < 1 (long conversations, edits land),
  * jaccard == 1 (short conversations the edit stride misses), and the
  * below-tau exclusion (the un-copied population).
  *
  * Output: (conv_a, conv_b, n_common, n_a, n_b, jaccard) with
  * conv_a < conv_b, one row per qualifying pair. jaccard is the single
  * IEEE division n_common / (n_a + n_b − n_common) — bit-identical in any
  * engine.
  */
object ConvNearDup {

  final case class Config(
      k: Int = 3,
      tau: Double = 0.5,
      maxBucket: Int = 64)

  /** Row budget for broadcasting the hot (stop-)shingle set (32-char md5
    * hex strings → ≤ ~100 MB relation). */
  val HotBroadcastMax: Long = 1L << 20

  /** Deterministic near-copy injection: conversations with cv%17==3 are
    * unioned back under `conv_id || "-dup"`, turns at ti%11==7 suffixed
    * with " (edited)". */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val dup = turns
      .filter(cv % 17 === 3)
      .withColumn("conv_id", concat(col("conv_id"), lit("-dup")))
      .withColumn("text",
        when(col("turn_idx") % 11 === 7,
          concat(col("text"), lit(" (edited)"))).otherwise(col("text")))
    turns.unionByName(dup)
  }

  def pairs(
      spark: SparkSession,
      turns: DataFrame,
      cfg: Config = Config()): DataFrame = {
    require(cfg.k >= 2, "k must be >= 2 (k == 1 is q90's exact-dup domain)")
    require(cfg.maxBucket >= 1, "maxBucket must be positive")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val parts = (0 until cfg.k).map {
      case 0 => col("text").as("_t0")
      case i => lead(col("text"), i).over(w).as(s"_t$i")
    }
    val names = (0 until cfg.k).map(i => col(s"_t$i"))
    // distinct (conv, shingle): set semantics; the window and the distinct
    // share the conv_id exchange (ClusteredDistribution subset rule). The
    // leads land as plain columns first (a window expression cannot sit in
    // a WHERE); lead(k-1) null ⇒ the window ran off the conversation
    // end (later leads null out first, so one check suffices).
    val shingles = turns
      .select("conv_id", "turn_idx", "text")
      .repartition(col("conv_id"))
      .select(col("conv_id") +: parts: _*)
      .filter(names.last.isNotNull)
      .select(col("conv_id"),
        md5(concat_ws("", names: _*).cast("binary")).as("sh"))
      .distinct()
      .localCheckpoint(true) // three consumers: sizes, index, pair join
    var hotRef: Option[DataFrame] = None
    try {
      val sizes = shingles.groupBy("conv_id").agg(count(lit(1)).as("n"))
      // stop-shingle cap: conversational boilerplate shared by more than
      // maxBucket conversations is pruned BEFORE the self-join. r6: the
      // cap is applied by ANTI-joining the HOT set (df > maxBucket — a
      // handful of boilerplate shingles) instead of inner-joining the RARE
      // set (≈ every shingle): same set algebra, but the build side is
      // tiny and broadcasts, so the pinned shingle table is filtered
      // map-side instead of paying a full extra exchange.
      val hot = shingles
        .groupBy("sh")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > cfg.maxBucket)
        .select("sh")
        .localCheckpoint(true)
      hotRef = Some(hot)
      // probed broadcast (the TurnDedup pattern): a corpus whose boilerplate
      // TYPE count itself explodes degrades to the shuffle anti-join
      val hotSide =
        if (hot.count() <= HotBroadcastMax) broadcast(hot) else hot
      val indexed = shingles.join(hotSide, Seq("sh"), "left_anti")
      val co = indexed.as("a")
        .join(indexed.as("b"), Seq("sh"))
        .filter(col("a.conv_id") < col("b.conv_id"))
        .groupBy(col("a.conv_id").as("conv_a"),
          col("b.conv_id").as("conv_b"))
        .agg(count(lit(1)).as("n_common"))
      val out = co
        .join(sizes.withColumnRenamed("conv_id", "conv_a")
          .withColumnRenamed("n", "n_a"), Seq("conv_a"))
        .join(sizes.withColumnRenamed("conv_id", "conv_b")
          .withColumnRenamed("n", "n_b"), Seq("conv_b"))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= cfg.tau)
        .select("conv_a", "conv_b", "n_common", "n_a", "n_b", "jaccard")
      // the pair table is small (near-dup pairs, not candidates) — pin it
      // so the caller's orderBy/collect does not re-run the self-join,
      // then release the shingle blocks
      out.localCheckpoint(true)
    } finally {
      shingles.unpersist(false)
      hotRef.foreach(_.unpersist(false))
    }
  }

  /** DuckDB oracle over the committed raw dump: injection, lead-window
    * shingling, md5, stop-shingle cap, self-join, Jaccard — recomputed
    * end-to-end by DuckDB's own engines (same md5 bytes, same IEEE
    * division). */
  def oracleSql(golden: String, cfg: Config = Config()): String = {
    val leads = (1 until cfg.k)
      .map(i => s"lead(text, $i) OVER win AS t$i").mkString(", ")
    val concatParts = (1 until cfg.k).map(i => s"t$i")
      .foldLeft("text")((a, b) => s"$a || chr(1) || $b")
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, text,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx, text FROM raw
         UNION ALL
         SELECT conv_id || '-dup' AS conv_id, turn_idx,
           CASE WHEN turn_idx % 11 = 7 THEN text || ' (edited)'
                ELSE text END AS text
         FROM raw WHERE cv % 17 = 3),
       led AS (
         SELECT conv_id, text, $leads
         FROM inj
         WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)),
       sh AS (
         SELECT DISTINCT conv_id, md5($concatParts) AS sh
         FROM led WHERE t${cfg.k - 1} IS NOT NULL),
       sizes AS (
         SELECT conv_id, count(*) AS n FROM sh GROUP BY conv_id),
       rare AS (
         SELECT sh FROM sh GROUP BY sh
         HAVING count(*) <= ${cfg.maxBucket}),
       idx AS (SELECT conv_id, sh FROM sh JOIN rare USING (sh)),
       co AS (
         SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
           cast(count(*) AS BIGINT) AS n_common
         FROM idx a JOIN idx b USING (sh)
         WHERE a.conv_id < b.conv_id
         GROUP BY 1, 2)
       SELECT conv_a, conv_b, n_common,
         cast(sa.n AS BIGINT) AS n_a, cast(sb.n AS BIGINT) AS n_b,
         cast(n_common AS DOUBLE) /
           cast(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
       FROM co
       JOIN sizes sa ON co.conv_a = sa.conv_id
       JOIN sizes sb ON co.conv_b = sb.conv_id
       WHERE cast(n_common AS DOUBLE) /
         cast(sa.n + sb.n - n_common AS DOUBLE) >= ${cfg.tau}
       ORDER BY conv_a, conv_b"""
  }
}
