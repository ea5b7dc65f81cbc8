package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-item detection at corpus scale via the two-pass
  * MISRA-GRIES + exact-recount pattern.
  *
  * A naive `groupBy(token).count().filter(n >= f)` shuffles EVERY distinct
  * token — at web scale that is billions of group keys moved for a result
  * of a few hundred rows. The sketch route bounds what moves:
  *
  *   - pass 1: each partition keeps a Misra-Gries summary of at most
  *     k = ceil(1/phi) counters (constant memory, one streaming scan).
  *     The union of partition summaries is a GUARANTEED SUPERSET of every
  *     item with global frequency >= phi·N: an item absent from partition
  *     i's summary has local frequency < n_i/(k+1) [Misra & Gries 1982],
  *     so an item absent everywhere has global frequency
  *     < N/(k+1) <= phi·N. Only |partitions|·k (item, count) rows reach
  *     the driver.
  *   - pass 2: exact map-side-combined counts of the candidate set only
  *     (a broadcast hash-set filter before the aggregate), then
  *     `>= ceil(phi·N)` — the output is therefore EXACTLY the set the
  *     naive full shuffle would produce, at a fraction of the exchange.
  *
  * The result is deterministic and oracle-checkable even though a sketch
  * sits in the middle — false positives are removed by the recount,
  * false negatives are impossible by the MG bound.
  */
object HeavyHitters {

  /** Bounded-memory Misra-Gries counter summary: at most `k` entries;
    * estimates are lower bounds with undercount <= n/(k+1). */
  final class MisraGries(val k: Int) extends Serializable {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = new java.util.HashMap[String, Long](k * 2)

    def add(x: String): Unit = {
      val c = counts.get(x)
      if (c != 0L) counts.put(x, c + 1)
      else if (counts.size < k) counts.put(x, 1L)
      else {
        // decrement-all; drop zeros (the classic O(1)-amortized step)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }

    /** Candidate union (pointwise-sum merge keeps the no-false-negative
      * guarantee; extra candidates die in the exact recount). */
    def absorb(entries: Array[(String, Long)]): MisraGries = {
      entries.foreach { case (x, c) => counts.put(x, counts.get(x) + c) }
      this
    }
  }

  /** Pass 1 only: candidate items possibly occurring >= phi·N times —
    * a superset, |result| <= |partitions|·ceil(1/phi). Also returns N. */
  def candidates(items: Dataset[String], phi: Double): (Array[String], Long) = {
    require(phi > 0 && phi < 1, s"phi in (0,1), got $phi")
    val k = math.ceil(1.0 / phi).toInt
    val partials = items.mapPartitions { it =>
      val mg = new MisraGries(k)
      var n = 0L
      it.foreach { x => mg.add(x); n += 1 }
      import scala.jdk.CollectionConverters._
      Iterator.single((n, mg.counts.asScala.toArray))
    }(org.apache.spark.sql.Encoders.kryo[(Long, Array[(String, Long)])])
      .collect()

    val merged = new MisraGries(math.max(k, 1))
    var total = 0L
    partials.foreach { case (n, arr) =>
      total += n
      merged.absorb(arr)
    }
    import scala.jdk.CollectionConverters._
    (merged.counts.keySet().asScala.toArray, total)
  }

  /** Two-pass exact frequent items over exploded `(item)` rows: EXACTLY
    * `{x : freq(x) >= ceil(phi·N)}` with exact counts, columns
    * (item, n). */
  def frequentExact(
      spark: SparkSession,
      items: Dataset[String],
      phi: Double
  ): DataFrame = {
    import spark.implicits._
    val norm = items.toDF("value").as[String] // any input column name
    val (cand, total) = candidates(norm, phi)
    val f = math.ceil(phi * total).toLong
    val candB = spark.sparkContext.broadcast(cand.toSet)
    val isCandidate = udf((x: String) => candB.value.contains(x))
    norm
      .filter(isCandidate(col("value")))
      .groupBy(col("value").as("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= f)
  }
}
