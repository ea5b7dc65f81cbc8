package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable TOP-K PER GROUP (quota curation: "best 5 docs per source") —
  * the grouped analog of [[graft.sim.Ann.bruteForceTopK]]'s bounded-heap
  * shape, replacing `row_number() OVER (PARTITION BY group ...) <= k`,
  * whose window sorts an entire group in ONE task (TBs per task at corpus
  * scale with a handful of sources).
  *
  * Two phases:
  *   1. map-side: every input partition keeps at most k rows per group in
  *      a bounded heap — a narrow pass, NO shuffle of the corpus; memory is
  *      |groups present in the partition| · k rows (the operator contract:
  *      groups are strata — sources, languages, tiers — not row ids);
  *   2. merge: the ≤ |partitions|·k survivors PER GROUP go through the
  *      plain grouped window — now over a provably bounded input (e.g.
  *      1000 partitions × k=5 = 5000 rows/group), where a single-task sort
  *      is the right plan.
  *
  * The only exchange in the whole plan carries survivor rows.
  *
  * Null scores/ties rank LAST (phase 1 and the phase-2 window agree:
  * `desc_nulls_last` / `asc_nulls_last`), so results match the usual
  * `ORDER BY score DESC, tie` window contract on non-null data and stay
  * deterministic when nulls appear.
  */
object GroupedTopK {

  /** Rows of `df` whose rank within `groupCol` under (`scoreCol` desc —
    * or asc when `descending=false` — then `tieCol` asc) is ≤ k, plus the
    * 1-based rank in `rankCol`. `tieCol` must be row-unique within a group
    * for a total, reproducible order. */
  def topK(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      tieCol: String,
      k: Int,
      descending: Boolean = true,
      rankCol: String = "rk"
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val gi = df.schema.fieldIndex(groupCol)
    val si = df.schema.fieldIndex(scoreCol)
    val ti = df.schema.fieldIndex(tieCol)
    // phase 1 and the phase-2 SQL window must agree on ordering, so only
    // atomic orderable types are accepted (arrays/structs/maps would also
    // ClassCastException in the heap comparator)
    Seq(scoreCol -> si, tieCol -> ti).foreach { case (name, i) =>
      import org.apache.spark.sql.types._
      val ok = df.schema(i).dataType match {
        case _: NumericType => true
        case StringType | BooleanType | DateType | TimestampType |
            TimestampNTZType => true
        case _ => false
      }
      require(ok,
        s"$name: unsupported ordering type ${df.schema(i).dataType} " +
          "(atomic orderable types only)")
    }
    val desc = descending

    // rank order: negative when a ranks BEFORE b (nulls last on both keys).
    // Strings compare as UTF-8 bytes UNSIGNED — Spark SQL's UTF8String
    // binary order — NOT Java's UTF-16 compareTo, which ranks
    // supplementary characters (surrogate pairs) before U+E000..U+FFFF
    // and would let the heap evict a row the phase-2 window keeps.
    def cmpAny(a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) 1
      else if (b == null) -1
      else (a, b) match {
        case (x: String, y: String) =>
          val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(xb.length, yb.length)
          var r = 0
          while (i < n && r == 0) {
            r = (xb(i) & 0xff) - (yb(i) & 0xff)
            i += 1
          }
          if (r != 0) r else xb.length - yb.length
        case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
      }
    def rankCmp(a: Row, b: Row): Int = {
      val s0 = cmpAny(a.get(si), b.get(si))
      val s =
        if (a.get(si) == null || b.get(si) == null) s0 // nulls last even desc
        else if (desc) -s0
        else s0
      if (s != 0) s else cmpAny(a.get(ti), b.get(ti))
    }

    val survivors = df.mapPartitions { it =>
      // heap head = the WORST kept row (eviction candidate)
      val heapOrd: Ordering[Row] = (x: Row, y: Row) => rankCmp(x, y)
      val heaps = new scala.collection.mutable.HashMap[
        Any, scala.collection.mutable.PriorityQueue[Row]]()
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(
          r.get(gi), new scala.collection.mutable.PriorityQueue[Row]()(heapOrd))
        if (h.size < k) h.enqueue(r)
        else if (rankCmp(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(df.schema))

    val scoreOrd: Column =
      if (desc) col(scoreCol).desc_nulls_last else col(scoreCol).asc_nulls_last
    val w = Window.partitionBy(groupCol)
      .orderBy(scoreOrd, col(tieCol).asc_nulls_last)
    survivors
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
