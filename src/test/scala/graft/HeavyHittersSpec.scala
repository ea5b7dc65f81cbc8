package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.HeavyHitters

/** Misra-Gries two-pass frequent items: exactness vs the naive full
  * count on skewed data whose vocabulary far exceeds the sketch size
  * (decrement path actually exercised). */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  /** Zipf-ish stream: heavy items h0..h9 plus a long tail of singletons,
    * deterministically interleaved (adversarial for MG: tail items keep
    * forcing decrements between heavy occurrences). */
  private def stream: Seq[String] = {
    val rng = new graft.gen.TranscriptGen.Rng(1234L)
    (0 until 60000).map { i =>
      val r = rng.nextInt(100)
      if (r < 40) s"h${r % 10}" // ~40% mass on 10 heavy items
      else s"tail_${rng.nextInt(20000)}" // ~18k distinct tail items
    }
  }

  test("MG kernel: bounded size, lower-bound estimates, no false negatives") {
    val xs = stream
    val k = 100
    val mg = new HeavyHitters.MisraGries(k)
    xs.foreach(mg.add)
    assert(mg.counts.size <= k, "summary must never exceed k entries")

    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = xs.length.toLong / (k + 1)
    import scala.jdk.CollectionConverters._
    mg.counts.asScala.foreach { case (x, est) =>
      assert(est <= exact(x), s"estimate for $x must be a lower bound")
      assert(exact(x) - est <= bound, s"undercount for $x exceeds n/(k+1)")
    }
    // every item with freq > n/(k+1) must be present
    exact.filter(_._2 > bound).keys.foreach { x =>
      assert(mg.counts.containsKey(x), s"frequent $x missing from summary")
    }
  }

  test("frequentExact == naive groupBy-count-filter, vocab >> sketch") {
    import spark.implicits._
    val xs = stream
    val phi = 0.01 // k = 100 counters vs ~18k distinct items
    val ds = xs.toDF("value").repartition(7).as[String]

    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val f = math.ceil(phi * xs.length).toLong
    val expected = exact.filter(_._2 >= f)
    assert(expected.size === 10, "exactly the 10 heavy items qualify")

    val got = HeavyHitters.frequentExact(spark, ds, phi)
      .as[(String, Long)].collect().toMap
    assert(got === expected)

    // candidate superset stays bounded: |partitions| * ceil(1/phi)
    val (cand, total) = HeavyHitters.candidates(ds, phi)
    assert(total === xs.length.toLong)
    assert(cand.length <= 8 * 100, s"candidate set blew up: ${cand.length}")
    assert(expected.keySet.subsetOf(cand.toSet))
  }
}
