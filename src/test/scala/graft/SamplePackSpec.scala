package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack
import graft.sample.Stratified

/** Invariant proofs for the data-mixing operators (stratified sampling,
  * sequence packing). */
class SamplePackSpec extends AnyFunSuite with SparkTestBase {

  test("EpochShuffle: rank equals the driver-sorted order, dense, seed-sensitive") {
    import spark.implicits._
    import graft.sample.EpochShuffle
    // non-contiguous ids so rank != id arithmetic, plus FULL-RANGE 64-bit
    // hash ids (negative included) — the ANSI-overflow regression case
    val ids = (0L until 997L).map(i => i * 7 + 3) ++
      Seq(Long.MaxValue, Long.MinValue + 1, -987654321098765432L)
    val df = ids.toDF("doc_id")

    def ranks(seed: Long): Map[Long, Long] =
      EpochShuffle.rank(spark, df,
          EpochShuffle.lcgKey(col("doc_id"), seed), col("doc_id"),
          numPartitions = 4)
        .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap

    val got = ranks(11L)
    val m = 2147483647L
    val expected = ids
      .sortBy { id =>
        val folded = ((id % m) + m) % m // pmod semantics for negatives
        val t = (folded * 48271 + 11) % m
        ((t * t) % m, id)
      }
      .zipWithIndex.map { case (id, i) => (id, i + 1L) }.toMap
    assert(got === expected, "must equal the global-sort rank across 4 partitions")
    assert(got.values.toSeq.sorted === (1L to ids.length))

    val other = ranks(12L)
    val moved = ids.count(id => got(id) != other(id))
    assert(moved > ids.length / 2, "different epoch seed must permute differently")
  }

  test("Mixture: alpha endpoints recover natural and uniform proportions") {
    import spark.implicits._
    import graft.sample.Mixture
    // three sources with mass 100 / 400 / 500
    val rows = (0 until 100).map(i => ("a", 1)) ++
      (0 until 100).map(i => ("b", 4)) ++ (0 until 100).map(i => ("c", 5))
    val df = rows.toDF("source", "sz")

    def w(alpha: Double): Map[String, Double] =
      Mixture.weights(df, col("source"), col("sz"), alpha)
        .select("group", "weight").as[(String, Double)].collect().toMap

    val natural = w(1.0)
    assert(natural === Map("a" -> 0.1, "b" -> 0.4, "c" -> 0.5))
    val uniform = w(0.0)
    assert(uniform.values.forall(v => math.abs(v - 1.0 / 3) < 1e-5))
    val tempered = w(0.5)
    assert(math.abs(tempered.values.sum - 1.0) < 1e-5)
    assert(tempered("a") > 0.1 && tempered("a") < 1.0 / 3,
      "alpha=0.5 must up-sample the small source toward (not past) uniform")
  }

  test("Interleave: every prefix proportional to weights, discrepancy <= 1") {
    import spark.implicits._
    import graft.sample.{Interleave, Mixture}
    // masses 400 / 100 / 100 at alpha=1 → weights 2/3, 1/6, 1/6
    val rows = (0 until 100).map(i => (s"a$i", "big", 4)) ++
      (0 until 100).map(i => (s"b$i", "s1", 1)) ++
      (0 until 100).map(i => (s"c$i", "s2", 1))
    val df = rows.toDF("doc_id", "source", "sz")
    val w = Mixture.weights(df, col("source"), col("sz"), alpha = 1.0)

    val out = Interleave
      .byWeight(spark, df.select("doc_id", "source"), col("source"),
        col("doc_id"), w, numPartitions = 4)
      .select("doc_id", "source", "interleave_rank")
      .as[(String, String, Long)].collect().sortBy(_._3)

    // every doc appears once (all sources carry weight > 0), ranks dense
    assert(out.length === 300)
    assert(out.map(_._3).toSeq === (1L to out.length))

    // prefix proportionality: the (r-0.5)/w schedule has per-source
    // discrepancy <= 1 at every prefix UNTIL a source exhausts its supply
    // (here big runs dry at L = 100/(2/3) = 150; beyond that only the
    // leftover sources can appear — inherent to finite streams)
    val weights = w.select("group", "weight").as[(String, Double)].collect().toMap
    for (l <- Seq(30, 60, 150)) {
      val prefix = out.take(l)
      weights.foreach { case (s, wt) =>
        val c = prefix.count(_._2 == s)
        assert(math.abs(c - l * wt) <= 1.0,
          s"prefix $l has $c of $s, expected ~${l * wt}")
      }
    }
  }

  test("Stratified.splitExpr: disjoint+exhaustive, fractions honored, prefix-stable") {
    import spark.implicits._
    import graft.sample.Stratified
    val df = (0 until 6000).map(i => s"document payload $i").toDF("text")

    def assign(splits: Seq[(String, Double)]): Map[String, String] =
      df.select(col("text"), Stratified.splitExpr(col("text"), splits).as("s"))
        .as[(String, String)].collect().toMap

    val a = assign(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // exhaustive (no nulls) + deterministic
    assert(a.size === 6000 && !a.values.exists(_ == null))
    assert(a === assign(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    // fractions within binomial tolerance (~4 sigma)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 4800) < 4 * math.sqrt(6000 * 0.8 * 0.2))
    assert(math.abs(counts("val") - 600) < 4 * math.sqrt(6000 * 0.1 * 0.9))
    // growing train only promotes rows INTO train (stable hash prefixes):
    // re-tuning the split never churns previously-assigned training rows
    val b = assign(Seq("train" -> 0.9, "test" -> 0.1))
    val trainA = a.collect { case (k, "train") => k }.toSet
    val trainB = b.collect { case (k, "train") => k }.toSet
    assert(trainA.subsetOf(trainB))
    // degenerate weights rejected eagerly
    intercept[IllegalArgumentException] {
      Stratified.splitExpr(col("text"), Seq("a" -> 0.7, "b" -> 0.5))
    }
  }

  test("Stratified: rates honored within binomial tolerance, subset-stable") {
    import spark.implicits._
    val rows = (0 until 4000).map(i => (s"s${i % 2}", s"payload text $i"))
    val df = rows.toDF("stratum", "text")

    def kept(rates: Map[String, Double]): Set[String] =
      Stratified.sample(df, "stratum", "text", rates)
        .select("text").as[String].collect().toSet

    val halfQuarter = kept(Map("s0" -> 0.5, "s1" -> 0.25))
    val n0 = halfQuarter.count(_.nonEmpty) // avoid unused warnings
    assert(n0 > 0)
    val perStratum = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.count(r => halfQuarter(r._2)).toDouble / rs.size
    }
    // 2000 draws per stratum: 5 sigma ≈ 0.056 at p=0.5
    assert(math.abs(perStratum("s0") - 0.5) < 0.06, perStratum)
    assert(math.abs(perStratum("s1") - 0.25) < 0.06, perStratum)

    // growing a stratum's rate only ADDS rows (hash-gate monotonicity) —
    // re-tuning a mix never churns previously selected rows
    val allHalf = kept(Map("s0" -> 0.5, "s1" -> 0.5))
    assert(halfQuarter.subsetOf(allHalf))

    // rate 1.0 keeps everything (exact, no "ffffffff" edge bias)
    assert(kept(Map("s0" -> 1.0, "s1" -> 1.0)).size == rows.size)
    // rate 0 keeps nothing
    assert(kept(Map("s0" -> 0.0, "s1" -> 0.0)).isEmpty)
    // strata absent from the map fall back to defaultRate (1.0 → all kept)
    val onlyS0 = Stratified.sample(df, "stratum", "text", Map("s0" -> 0.0))
      .select("stratum").as[String].collect()
    assert(!onlyS0.contains("s0") && onlyS0.count(_ == "s1") == 2000)
  }

  test("Pack.contiguous matches the sequential offset-packing simulation") {
    import spark.implicits._
    val r = new graft.gen.TranscriptGen.Rng(99L)
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0 until 200
      // every ~30th doc exceeds the whole budget (giant-document case:
      // offset packing must place it by start offset and move on)
    } yield (g, i.toLong,
      if (i % 30 == 7) 100L + r.nextInt(100) else 1L + r.nextInt(40))
    val budget = 64L

    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      var cum = 0L
      rs.sortBy(_._2).map { case (_, ord, wt) =>
        val bin = cum / budget
        cum += wt
        (g, ord) -> bin
      }
    }

    val got = Pack.contiguous(rows.toDF("g", "ord", "wt"),
      Seq("g"), "ord", "wt", budget)
      .select("g", "ord", "bin").as[(String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(got == expected)

    // manifest totals reconcile with the input
    val m = Pack.manifest(rows.toDF("g", "ord", "wt"), Seq("g"), "ord", "wt", budget)
    val sums = m.agg(sum("n_docs"), sum("sum_weight")).as[(Long, Long)].head()
    assert(sums == ((rows.size.toLong, rows.map(_._3).sum)))
  }
}
