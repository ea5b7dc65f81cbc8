package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-mode stress check: forces the OVER-BUDGET code paths of the
  * near-dup family (the shapes a 100-TB corpus takes — shuffle joins
  * instead of broadcast verify) on a corpus ~50× the sf0.1 bench and
  * reports wall time + result/truncation counts as one JSON line.
  *
  * Usage: `sbt "runMain graft.Stress [sfLabel]"` (default sf0.5 — ~680k
  * staged turns). Results are recorded in BASELINE.md; this main is
  * evidence, not a driver surface.
  */
object Stress {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimal dots
    val sfLabel = args.headOption.getOrElse("sf0.5")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CHECKPOINT_DIR runs the whole stress battery in the
    // reliable-checkpoint pinning mode (Materialize.pin) — the over-budget
    // tiers ARE the 100-TB shapes, so they too must be mode-invariant
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(d => spark.conf.set(graft.run.Materialize.ConfKey, d))

    // staged synthetic corpus (exact-deduped turn texts, stable ids);
    // sfOf parses the label so no testdata directory is touched
    val docs = SparkEntry.dedupCorpusPublic(spark, sfLabel)
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed: every block returns scalars (counts) by convention, so its
      // internal pinned stages are dead once `a` is computed — free them so
      // the ~20-family battery doesn't stack dead localCheckpoint blocks
      // (cross-block DataFrames like `pairs` use a raw, untracked
      // localCheckpoint precisely so this release cannot touch them)
      graft.run.Materialize.releaseAll(spark)
      (a, dt)
    }

    // MinHash LSH, forced shuffle-verify mode (maxBroadcastBytes = 0)
    val cfg = graft.dedup.MinHashLSH.Config(maxBroadcastBytes = 0L)
    val ((mhPairs, mhStats), mhSec) = timed {
      val (df, st) = graft.dedup.MinHashLSH.nearDuplicatesWithStats(spark, docs, cfg)
      (df.count(), st)
    }

    // MinHash LSH, mid-tier: full state over budget but the 16-slot sample
    // table broadcastable -> map-side sampled prefilter inside the buckets
    val midBudget = cfg.midTierBudget(nDocs)
    val (mhMidPairs, mhMidSec) = timed {
      graft.dedup.MinHashLSH.nearDuplicates(spark, docs,
        graft.dedup.MinHashLSH.Config(maxBroadcastBytes = midBudget)).count()
    }

    // n-gram Jaccard, forced shuffle-verify mode
    val (njPairs, njSec) = timed {
      graft.dedup.NgramJaccard
        .similarPairs(spark, docs, n = 2, tau = 0.5, maxBroadcastBytes = 0L)
        .count()
    }

    // SimHash (already sketch-only; same corpus for completeness)
    val (shPairs, shSec) = timed {
      graft.dedup.SimHash.nearDuplicates(spark, docs).count()
    }

    // duplicate-group resolution over the MinHash pair graph, distributed
    // star-contraction FORCED (smallModeMaxEdges = 0) — the shuffle-round
    // path a web-scale pair graph takes
    val pairs = graft.dedup.MinHashLSH.nearDuplicates(spark, docs,
      graft.dedup.MinHashLSH.Config(maxBroadcastBytes = midBudget))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint(true) // timed block must not re-run the LSH pass
    val ((ccGroups, ccRounds), ccSec) = timed {
      val (asg, rounds) = graft.dedup.DupGroups
        .connectedComponentsWithStats(spark, pairs, smallModeMaxEdges = 0)
      (asg.select(countDistinct(col("group_id"))).head().getLong(0), rounds)
    }

    // epoch shuffle: seeded global rank over the whole corpus (range
    // exchange + materialize + offsets — the full zipWithIndex machinery)
    val (esRows, esSec) = timed {
      graft.sample.EpochShuffle.rank(spark, docs.select("id"),
        graft.sample.EpochShuffle.lcgKey(col("id"), 3L), col("id")).count()
    }

    // mixture + weighted interleave over 16 synthetic sources
    val (ilRows, ilSec) = timed {
      val sourced = docs.withColumn(
        "source", concat(lit("s"), pmod(col("id"), lit(16))))
      val w = graft.sample.Mixture.weights(
        sourced, col("source"), length(col("text")), alpha = 0.5)
      graft.sample.Interleave
        .byWeight(spark, sourced.select("id", "source"), col("source"),
          col("id"), w)
        .count()
    }

    // grouped top-k: per-partition bounded heaps + survivor merge over the
    // full corpus (the quota-curation 100-TB shape — corpus never shuffles)
    val (tkRows, tkSec) = timed {
      graft.operators.GroupedTopK.topK(
        docs.withColumn("source", concat(lit("s"), pmod(col("id"), lit(16))))
          .withColumn("n_chars", length(col("text")))
          .select("source", "id", "n_chars"),
        groupCol = "source", scoreCol = "n_chars", tieCol = "id", k = 5)
        .count()
    }

    // Bloom-prefiltered incremental dedup: second half of the corpus as
    // the increment against the first half (possible-dup-only exchange)
    val (biRows, biSec) = timed {
      val hashed = docs.select(col("id"), xxhash64(col("text")).as("h"))
      val half = nDocs / 2
      graft.dedup.Incremental.newRows(spark,
        hashed.filter(col("id") % 2 === 0),
        hashed.filter(col("id") % 2 === 1).select("h"),
        "h", expectedItems = half, fpp = 0.01).count()
    }

    // repeated-substring span dedup: three corpus scans + hash/substring
    // aggregations at 50× bench scale (the confirmed boilerplate set stays
    // broadcast-sized by construction — template phrases, not the corpus)
    val ((sdSpans, sdRemoved), sdSec) = timed {
      val out = graft.text.SubstrDedup.dedup(spark, docs, "id", "text")
      val row = out.agg(sum(col("n_spans")), sum(col("chars_removed"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // the same span dedup with the DISTRIBUTED confirm tier forced
    // (maxConfirmedChars = 1): the confirmed-substring set never touches
    // the driver — shuffle semi-join membership; span/char counts must be
    // identical to the broadcast tier above
    val ((sdDistSpans, sdDistRemoved), sdDistSec) = timed {
      val out = graft.text.SubstrDedup.dedup(spark, docs, "id", "text",
        graft.text.SubstrDedup.Config(maxConfirmedChars = 1L))
      val row = out.agg(sum(col("n_spans")), sum(col("chars_removed"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // SemDeDup at 50× scale: deterministic hash-derived embeddings (dim 32)
    // with planted near-copies (id % 97 == 0), k=512 coarse clusters, and
    // maxPairwise=2048 so the count-planned sub-cell SPLIT path (the
    // 100-TB guard rail for over-cap clusters) is exercised, not just the
    // single-cell path the sf0.01 oracle covers. Group/drop counts are the
    // cross-round determinism evidence.
    val semCorpus = {
      import spark.implicits._
      val dim = 32
      val base = docs.select(col("id"), xxhash64(col("text")).as("h"))
        .as[(Long, Long)]
        .map { case (id, h) =>
          val v = Array.tabulate(dim) { d =>
            (((graft.gen.TranscriptGen.mix64(h ^ (d * 1000003L + 7L)) >>> 11)
              * (1.0 / (1L << 53))) - 0.5).toFloat
          }
          (id, v)
        }
      val planted = base.filter(_._1 % 97 == 0).map { case (id, v) =>
        (id + 1000000000L, v.zipWithIndex.map { case (x, i) =>
          if (i % 8 == 0) x + 1e-3f else x })
      }
      base.union(planted).toDF("vec_id", "embedding")
        .localCheckpoint(true) // the two tiers below must not re-synthesize
    }
    def semRun(maxPairwise: Int): (Long, Long, Long) = {
      val out = graft.dedup.SemDedup.dedup(spark, semCorpus,
        k = 512, eps = 0.98, maxPairwise = maxPairwise)
      val row = out.agg(
        countDistinct(col("group_id")),
        sum(when(col("keep"), 0L).otherwise(1L)),
        count(lit(1))).head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val ((semGroups, semDropped, semRows), semSec) = timed(semRun(2048))
    // the same corpus with the sub-cell SPLIT forced (cap 256 < the ~300
    // average cluster size): the over-cap guard rail provably runs at
    // scale; the recall delta vs the entry above is the documented cost
    val ((semSpGroups, semSpDropped, _), semSpSec) = timed(semRun(256))

    // corpus-trained KN bigram LM at 50× scale: train on the even-id half,
    // score the WHOLE corpus with broadcast integer micro-nat tables. The
    // reported score is a Long total of per-doc Long sums — associative,
    // so it is partitioning/mode-invariant by construction, and any
    // nondeterminism anywhere in the chain (tokenization, model
    // arithmetic, broadcast) would move it. Entry/score/oov counts are
    // the cross-round determinism evidence; time scales with corpus
    // bytes (one bigram exchange for training, a narrow pass to score).
    val ((knEntries, knScoreSum, knOov), knSec) = timed {
      val model = graft.text.KnScorer.buildModel(
        graft.text.KnTrainer.bigramModel(spark,
          docs.where(col("id") % 2 === 0), "text"))
      val scored = graft.text.KnScorer.score(spark, docs, "text", model, idCol = "id")
      val row = scored.agg(sum(col("score_micro")), sum(col("n_oov"))).head()
      import scala.jdk.CollectionConverters._
      val entries = model.pair.values.asScala.map(_.size.toLong).sum
      (entries, row.getLong(0), row.getLong(1))
    }

    // the same scoring with the DISTRIBUTED JOIN TIER forced (maxEntries=1
    // puts the model over the broadcast budget): the over-budget path a
    // larger-than-driver seed takes — the exact Long score-sum must equal
    // the broadcast tier's above
    val ((knJoinScoreSum, knJoinOov), knJoinSec) = timed {
      val scored = graft.text.KnScorer.trainAndScore(spark,
        docs.where(col("id") % 2 === 0), docs, "text",
        maxEntries = 1L, idCol = "id")
      val row = scored.agg(sum(col("score_micro")), sum(col("n_oov"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // the same at TRIGRAM order (q75/q76): five broadcast micro-nat
    // tables; the exact Long score-sum is again the determinism witness
    val ((kn3Entries, kn3ScoreSum, kn3Oov), kn3Sec) = timed {
      val model = graft.text.KnScorer.buildTriModel(
        graft.text.KnTrainer.trigramModel(spark,
          docs.where(col("id") % 2 === 0), "text"))
      val scored = graft.text.KnScorer.scoreTri(spark, docs, "text", model, idCol = "id")
      val row = scored.agg(sum(col("score_micro")), sum(col("n_oov"))).head()
      (model.tri.size().toLong, row.getLong(0), row.getLong(1))
    }

    // trigram scoring with the DISTRIBUTED JOIN TIER forced: five model-
    // table join sides; the exact Long score-sum must equal kn3's above
    val ((kn3JoinScoreSum, kn3JoinOov), kn3JoinSec) = timed {
      val scored = graft.text.KnScorer.trainAndScoreTri(spark,
        docs.where(col("id") % 2 === 0), docs, "text",
        maxEntries = 1L, idCol = "id")
      val row = scored.agg(sum(col("score_micro")), sum(col("n_oov"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // span-level benchmark decontamination at 50×: probe excerpts from
    // every 97th doc (benchmark-bounded broadcast), k=20 windows; the
    // corpus never shuffles in the broadcast tier. Run again with the
    // probe byte budget forced to 1 so the DISTRIBUTED semi-join tier
    // (the over-budget path) proves itself at scale — span/char counts
    // must be identical across tiers and rounds.
    val sdBench = docs
      .where(col("id") % 97 === 0 && length(col("text")) >= 80)
      .select(substring(col("text"), 11, 60).as("text"))
      .localCheckpoint(true)
    def sdcRun(maxChars: Long): (Long, Long) = {
      val out = graft.text.SpanDecontaminate.cut(spark, docs, sdBench,
        "id", "text", graft.text.SpanDecontaminate.Config(
          k = 20, maxProbeChars = maxChars))
      val row = out.agg(sum(col("n_spans")), sum(col("chars_removed"))).head()
      (row.getLong(0), row.getLong(1))
    }
    val ((dcSpans, dcRemoved), dcSec) = timed(sdcRun(32L << 20))
    val ((dcDistSpans, dcDistRemoved), dcDistSec) = timed(sdcRun(1L))

    // DSIR importance weights at 50×: target = even-id half, raw = odd
    // half, score the WHOLE corpus. The exact Long weight-sum is the
    // determinism witness (integer micro-nat sums — associative), and the
    // 4096-bucket models bound the broadcast by construction.
    val ((dsirFeats, dsirWeightSum), dsirSec) = timed {
      val lam = graft.text.Dsir.weightTable(
        graft.text.Dsir.bucketCounts(spark, docs.where(col("id") % 2 === 0), "text"),
        graft.text.Dsir.bucketCounts(spark, docs.where(col("id") % 2 =!= 0), "text"))
      val row = graft.text.Dsir.score(spark, docs, "text", lam, idCol = "id")
        .agg(sum(col("n_feats")), sum(col("weight_micro"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // Gopher repetition battery at 50× (with the q78 4-token line wrap):
    // all-integer witnesses — dropped-doc count and total duplicated-5-gram
    // char mass. One zero-shuffle pass over the wrapped corpus.
    val ((repDropped, repDup5Sum), repSec) = timed {
      val arr = split(col("text"), " ")
      val wrapped = docs.select(col("id"),
        array_join(
          transform(sequence(lit(0), size(arr) - 1, lit(4)),
            i => array_join(slice(arr, i + 1, lit(4)), " ")),
          "\n").as("text"))
      val row = graft.quality.Repetition(spark, wrapped, "text", idCol = "id")
        .agg(sum(when(col("keep"), 0L).otherwise(1L)), sum(col("dup5_chars")))
        .head()
      (row.getLong(0), row.getLong(1))
    }

    // zlib compressibility at 50×: total compressed bytes is the witness
    // (deflate is deterministic); this is the per-row native-CPU throughput
    // probe for the signal at scale.
    val ((zDropped, zBytesSum), zSec) = timed {
      val row = graft.quality.Compressibility(spark, docs, "text", idCol = "id")
        .agg(sum(when(col("keep"), 0L).otherwise(1L)), sum(col("z_bytes")))
        .head()
      (row.getLong(0), row.getLong(1))
    }

    // BM25 retrieval at 50×: probe excerpts from every 97th doc (the
    // span-decon query shape), top-10 per query; witnesses are the
    // survivor-row count and the exact Long sum of top-k micro-unit scores.
    val ((bmRows, bmScoreSum), bmSec) = timed {
      val q = docs.where(col("id") % 97 === 0 && length(col("text")) >= 80)
        .select(col("id"), substring(col("text"), 11, 60).as("text"))
      val top = graft.text.Bm25.search(spark, docs, q, "text", k = 10, idCol = "id")
      val row = top.agg(count(lit(1)), sum(col("score_micro"))).head()
      (row.getLong(0), row.getLong(1))
    }

    // transcript family at scale: ~18M generated turns (1M convs + the
    // 5000-turn mega-conv) through turn dedup and the conversation gate,
    // ~3.7M turns through the regex-chain pseudonymized rewrite. Integer
    // witnesses: duplicate-row count + occurrence mass, kept-conversation
    // count + exact gap-sum, substitution count + scrubbed char mass.
    val bigTurns = graft.gen.TranscriptGen
      .dataset(spark, 1000000L, megaTurns = 5000).toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), unix_millis(col("ts")).as("ts_ms"))
    val ((tdDups, tdOccSum), tdSec) = timed {
      val row = graft.transcript.TurnDedup.dedup(spark, bigTurns)
        .agg(sum(when(col("keep"), 0L).otherwise(1L)), sum(col("n_occ")))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    val ((cgKept, cgGapSum), cgSec) = timed {
      val row = graft.transcript.ConvGate.signals(spark, bigTurns)
        .agg(sum(when(col("keep"), 1L).otherwise(0L)), sum(col("gap_sum")))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    val smallTurns = bigTurns.where(
      abs(xxhash64(col("conv_id"))) % 5 === 0)
    val ((prSubs, prChars), prSec) = timed {
      val row = graft.transcript.Pseudonymize.rewrite(spark, smallTurns)
        .agg(sum(col("n_aliased")), sum(length(col("scrubbed")))).head()
      (row.getLong(0), row.getLong(1))
    }
    // q104-q106 profile family at the same ~18M-turn scale. Witnesses:
    // total latency samples + errors + the p50/p95 mass over tools; total
    // transitions (== corpus turns, the conservation invariant) + illegal
    // mass; family count + member mass + depth mass.
    val ((tpCalls, tpErrors, tpPctSum), tpSec) = timed {
      val row = graft.transcript.ToolProfile.profile(spark,
        graft.transcript.ToolProfile.inject(bigTurns))
        .agg(sum(col("n_calls")), sum(col("n_errors")),
          sum(col("p50_lat_ms") + col("p95_lat_ms"))).head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val ((rgTrans, rgIllegal), rgSec) = timed {
      val row = graft.transcript.RoleGrammar.matrix(spark,
        graft.transcript.RoleGrammar.inject(bigTurns))
        .agg(sum(col("n_transitions")),
          sum(when(col("legal"), 0L).otherwise(col("n_transitions"))))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    val ((bfFams, bfConvs, bfDepth), bfSec) = timed {
      val row = graft.transcript.BranchFamilies.families(spark,
        graft.transcript.BranchFamilies.inject(bigTurns))
        .agg(count(lit(1)), sum(col("n_convs")), sum(col("shared_depth")))
        .head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    // FORCED over-budget tier (broadcastMaxRows = 0): both joins degrade to
    // fixed-width-key shuffles — the r4-verdict #1 degrade path. Witnesses
    // must match the broadcast tier exactly.
    val ((bfShFams, bfShConvs, bfShDepth), bfShSec) = timed {
      val row = graft.transcript.BranchFamilies.families(spark,
        graft.transcript.BranchFamilies.inject(bigTurns),
        broadcastMaxRows = 0L)
        .agg(count(lit(1)), sum(col("n_convs")), sum(col("shared_depth")))
        .head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }

    // two-pass Misra-Gries frequent bigrams (phi = 1e-4 → 10k counters)
    val (hhRows, hhSec) = timed {
      import spark.implicits._
      val grams = graft.text.Ngrams
        .explodeNgrams(docs.withColumnRenamed("id", "doc_id"),
          "doc_id", "text", n = 2)
        .select(col("gram")).as[String]
      graft.text.HeavyHitters.frequentExact(spark, grams, phi = 1e-4).count()
    }

    val json =
      f"""{"stress":"$sfLabel","docs":$nDocs,"cpus":$cpus,""" +
        f""""minhash_large":{"sec":$mhSec%.1f,"pairs":$mhPairs,"truncated_buckets":${mhStats.truncatedBuckets.value},"dropped_ids":${mhStats.droppedIds.value}},""" +
        f""""minhash_mid":{"sec":$mhMidSec%.1f,"pairs":$mhMidPairs},""" +
        f""""ngram_jaccard_large":{"sec":$njSec%.1f,"pairs":$njPairs},""" +
        f""""simhash":{"sec":$shSec%.1f,"pairs":$shPairs},""" +
        f""""dup_groups_dist":{"sec":$ccSec%.1f,"groups":$ccGroups,"rounds":$ccRounds},""" +
        f""""epoch_shuffle":{"sec":$esSec%.1f,"rows":$esRows},""" +
        f""""interleave":{"sec":$ilSec%.1f,"rows":$ilRows},""" +
        f""""grouped_topk":{"sec":$tkSec%.1f,"rows":$tkRows},""" +
        f""""bloom_incremental":{"sec":$biSec%.1f,"rows":$biRows},""" +
        f""""substr_dedup":{"sec":$sdSec%.1f,"spans":$sdSpans,"chars_removed":$sdRemoved},""" +
        f""""substr_dedup_dist":{"sec":$sdDistSec%.1f,"spans":$sdDistSpans,"chars_removed":$sdDistRemoved},""" +
        f""""semdedup":{"sec":$semSec%.1f,"rows":$semRows,"groups":$semGroups,"dropped":$semDropped},""" +
        f""""semdedup_split":{"sec":$semSpSec%.1f,"groups":$semSpGroups,"dropped":$semSpDropped},""" +
        f""""kn_train_score":{"sec":$knSec%.1f,"entries":$knEntries,"score_sum":$knScoreSum,"oov":$knOov},""" +
        f""""kn_score_join":{"sec":$knJoinSec%.1f,"score_sum":$knJoinScoreSum,"oov":$knJoinOov},""" +
        f""""kn3_train_score":{"sec":$kn3Sec%.1f,"entries":$kn3Entries,"score_sum":$kn3ScoreSum,"oov":$kn3Oov},""" +
        f""""kn3_score_join":{"sec":$kn3JoinSec%.1f,"score_sum":$kn3JoinScoreSum,"oov":$kn3JoinOov},""" +
        f""""span_decon":{"sec":$dcSec%.1f,"spans":$dcSpans,"chars_removed":$dcRemoved},""" +
        f""""span_decon_dist":{"sec":$dcDistSec%.1f,"spans":$dcDistSpans,"chars_removed":$dcDistRemoved},""" +
        f""""dsir":{"sec":$dsirSec%.1f,"feats":$dsirFeats,"weight_sum":$dsirWeightSum},""" +
        f""""repetition":{"sec":$repSec%.1f,"dropped":$repDropped,"dup5_chars":$repDup5Sum},""" +
        f""""compressibility":{"sec":$zSec%.1f,"dropped":$zDropped,"z_bytes":$zBytesSum},""" +
        f""""bm25":{"sec":$bmSec%.1f,"rows":$bmRows,"score_sum":$bmScoreSum},""" +
        f""""turn_dedup":{"sec":$tdSec%.1f,"dups":$tdDups,"occ_sum":$tdOccSum},""" +
        f""""conv_gate":{"sec":$cgSec%.1f,"kept":$cgKept,"gap_sum":$cgGapSum},""" +
        f""""pseudo_rewrite":{"sec":$prSec%.1f,"subs":$prSubs,"chars":$prChars},""" +
        f""""tool_profile":{"sec":$tpSec%.1f,"calls":$tpCalls,"errors":$tpErrors,"pct_sum":$tpPctSum},""" +
        f""""role_grammar":{"sec":$rgSec%.1f,"transitions":$rgTrans,"illegal":$rgIllegal},""" +
        f""""branch_families":{"sec":$bfSec%.1f,"families":$bfFams,"convs":$bfConvs,"depth_sum":$bfDepth},""" +
        f""""branch_families_shuffle":{"sec":$bfShSec%.1f,"families":$bfShFams,"convs":$bfShConvs,"depth_sum":$bfShDepth},""" +
        f""""frequent_ngrams":{"sec":$hhSec%.1f,"rows":$hhRows}}"""
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STRESS_OUT", "stress_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[stress] write $outFile: $e") }
    spark.stop()
  }
}
