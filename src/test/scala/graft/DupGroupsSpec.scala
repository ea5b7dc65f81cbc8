package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DupGroups

/** Connected-component duplicate grouping vs a sequential union-find
  * oracle, on the adversarial graph shapes: long chains (propagation
  * worst case), cliques (hub worst case), singletons, and a seeded
  * random graph. */
class DupGroupsSpec extends AnyFunSuite with SparkTestBase {

  /** Sequential union-find with path compression — the spec oracle. */
  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // root labels are not guaranteed minimal by rank-less union; normalize
    val groups = (0L until n).groupBy(find)
    groups.flatMap { case (_, ids) =>
      val m = ids.min; ids.map(_ -> m)
    }
  }

  /** Runs BOTH modes: `components` takes the small-mode (driver
    * union-find) path at these sizes; the distributed large/small-star
    * path is forced with smallModeMaxEdges = 0 and must agree on every
    * id that appears in an edge. */
  private def run(n: Long, edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val v = (0L until n).toDF("id")
    val got = DupGroups.components(spark, e, v)
      .select("id", "group_id").as[(Long, Long)].collect().toMap
    val (asgDist, rounds) =
      DupGroups.connectedComponentsWithStats(spark, e, smallModeMaxEdges = 0)
    val dist = asgDist.select("id", "group_id").as[(Long, Long)].collect().toMap
    val edgeIds = edges.flatMap(p => Seq(p._1, p._2)).filter { id =>
      edges.exists(q => q._1 != q._2 && (q._1 == id || q._2 == id))
    }.toSet
    assert(dist === got.filter { case (id, _) => edgeIds.contains(id) },
      "distributed and small-mode assignments must agree")
    (got, rounds)
  }

  test("chain of 200 nodes collapses to one group in logarithmic rounds") {
    val edges = (0L until 199L).map(i => (i, i + 1))
    val (got, rounds) = run(200, edges)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 200)
    info(s"chain-200 rounds = $rounds")
    assert(rounds <= 12, s"chain should converge in O(log n) rounds, took $rounds")
  }

  test("cliques + singletons + random graph match union-find exactly") {
    // three cliques (0-9, 20-24, 40-49), bridges 9-20, singletons elsewhere
    val clique = (lo: Long, hi: Long) =>
      for (a <- lo to hi; b <- (a + 1) to hi) yield (a, b)
    val edges = clique(0, 9) ++ clique(20, 24) ++ clique(40, 49) ++
      Seq((9L, 20L), (55L, 55L)) // bridge + self-loop
    val (got, _) = run(60, edges)
    assert(got === unionFind(60, edges))
    assert(got(24L) === 0L, "bridge must merge the two cliques")
    assert(got(55L) === 55L, "self-loop node stays a singleton")
    assert(got(59L) === 59L)

    // seeded random graph: duplicate edges, both directions, skewed hub
    val rng = new graft.gen.TranscriptGen.Rng(4242L)
    val rand = (0 until 300).map { _ =>
      (rng.nextInt(120).toLong, rng.nextInt(120).toLong)
    } ++ (0 until 40).map(_ => (7L, rng.nextInt(120).toLong)) // hub node 7
    val (gotR, _) = run(120, rand)
    assert(gotR === unionFind(120, rand))
  }

  test("empty edge set: every vertex is its own kept representative") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val v = (0L until 5L).toDF("id")
    val got = DupGroups.components(spark, e, v)
      .select("id", "group_id", "keep").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got === (0L until 5L).map(i => (i, i, true)))
  }
}
