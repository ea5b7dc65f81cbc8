package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-GROUP resolution: collapse a near-duplicate PAIR graph (from
  * [[MinHashLSH]], [[SimHash]] or [[NgramJaccard]]) into connected
  * components, so the pipeline can make the actual dedup decision — one
  * kept representative per group, everything else dropped.
  *
  * Reference behavior: CorpusAid's dedup keeps the first occurrence and
  * drops later ones (`/root/reference/src/CorpusAid.py:2552-2560`, the
  * `seen`-set file dedup); at corpus scale with FUZZY pairs the same
  * "keep the first" contract requires transitive closure first — A~B and
  * B~C must land in one group even when A!~C, and the kept doc is the
  * group's minimum id (deterministic, order-stable).
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed as
  * DataFrame joins — the published O(log^2 n)-round algorithm whose edge
  * volume NEVER exceeds the input edge count, unlike naive min-label
  * propagation which needs O(diameter) rounds (a 10^6-long chain of
  * near-dup shingled crawl snapshots would need 10^6 shuffles).
  *
  *  - large-star: every node points its LARGER neighbors at its current
  *    minimum — long chains halve in hop count each round;
  *  - small-star: every node and its smaller neighbors collapse onto the
  *    minimum — stars flatten to depth 1.
  *
  * Each round is two hash-aggregate + join shuffles on bare (long, long)
  * edges — no adjacency lists are ever materialized (`collect_list` on a
  * boilerplate hub node would OOM an executor; the min-aggregate + join
  * formulation streams instead). Convergence is detected by an exact
  * (count, xor-of-edge-hashes) signature; every round is eagerly
  * materialized via `localCheckpoint(true)` so lineage stays O(1) across
  * iterations (the classic iterative-algorithm stack-overflow trap).
  */
object DupGroups {

  /** (assignments, rounds): assignments has columns `id`, `group_id` =
    * the minimum id reachable from `id` — one row per DISTINCT id present
    * in `edges`. Nodes with no edges are absent (join the vertex universe
    * with [[components]] to materialize singletons).
    *
    * `edges` needs columns `src`, `dst` (long); direction, duplicate
    * edges and self-loops are all tolerated.
    */
  def connectedComponentsWithStats(
      spark: SparkSession,
      edges: DataFrame,
      maxRounds: Int = 50,
      smallModeMaxEdges: Long = 1L << 21
  ): (DataFrame, Int) = {
    val u = col("u"); val v = col("v")

    // normalize: undirected (u > v), no self-loops, distinct. The exact
    // (count, xor-of-edge-hashes) signature RIDES the materialization via
    // observe (round 6) — the separate edgeSignature job per checkpoint
    // cost one barrier per round plus one up front.
    var eObs = org.apache.spark.sql.Observation()
    var e = edges
      .select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(u =!= v)
      .distinct()
      .observe(eObs, signatureAggs.head, signatureAggs.tail: _*)
      .localCheckpoint(true)

    var sig = observedSignature(eObs)

    // Near-dup pair graphs are sparse relative to the corpus (edges ~
    // duplicate docs, not all docs): under the budget (~32 MB at the
    // default), a driver union-find replaces O(log n) shuffle ROUNDS with
    // one collect — same small/large-mode split as [[MinHashLSH]]. The
    // iterative path below is the 100-TB mode (forced in tests via
    // smallModeMaxEdges = 0).
    if (sig._1 <= smallModeMaxEdges) {
      import spark.implicits._
      val arr = e.as[(Long, Long)].collect()
      e.unpersist(false) // checkpoint blocks no longer needed once collected
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != r) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      arr.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val ids = arr.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      val asg = ids.iterator.map(id => (id, find(id))).toSeq
      return (asg.toDF("id", "group_id"), 0)
    }

    var rounds = 0
    var converged = sig._1 == 0L

    while (!converged && rounds < maxRounds) {
      // LARGE-STAR over the bidirected graph: m(x) = min(x, N(x));
      // emit (nbr -> m(x)) for every STRICTLY LARGER neighbor. Keeping
      // only larger neighbors bounds the output by the input edge count
      // and guarantees monotone progress (Kiveris Lemma 1).
      val bidir = e.select(u, v).union(e.select(v.as("u"), u.as("v")))
      val mins = bidir.groupBy(u).agg(least(min(v), u).as("m"))
      val large = bidir
        .join(mins, "u")
        .where(v > u)
        .select(v.as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      // prior round's edges are dead once `large` is materialized — without
      // an explicit unpersist a slow-converging run pins rounds×|edges| of
      // executor storage until nondeterministic driver GC frees the handles
      // (and evicted localCheckpoint blocks are non-recomputable)
      e.unpersist(false)

      // SMALL-STAR on the (u > v)-normalized edges: m(x) = min smaller
      // neighbor; every other smaller neighbor AND x itself re-point at m.
      val norm = large.select(greatest(u, v).as("u"), least(u, v).as("v"))
      val smins = norm.groupBy(u).agg(min(v).as("m"))
      val perEdge = norm
        .join(smins, "u")
        .where(v =!= col("m"))
        .select(v.as("u"), col("m").as("v"))
      val perNode = smins.select(u, col("m").as("v"))
      eObs = org.apache.spark.sql.Observation()
      e = perEdge
        .union(perNode)
        .where(col("u") =!= col("v"))
        .distinct()
        .observe(eObs, signatureAggs.head, signatureAggs.tail: _*)
        .localCheckpoint(true)
      large.unpersist(false) // consumed by the small-star materialization

      val next = observedSignature(eObs)
      converged = next == sig
      sig = next
      rounds += 1
    }

    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds — " +
          "the edge list is not yet a star forest and assignments would " +
          "be wrong; raise maxRounds (O(log^2 n) suffices per SoCC'14)")

    // At the fixed point every edge is (member -> group minimum): the
    // assignment is the edge list itself plus one row per root.
    val members = e.select(u.as("id"), v.as("group_id"))
    val roots = e.select(v.as("id")).distinct()
      .select(col("id"), col("id").as("group_id"))
    (members.union(roots).distinct(), rounds)
  }

  /** Exact edge-multiset signature for convergence detection: count +
    * xor-of-hashes, collision-safe in practice (64-bit xxhash over
    * distinct-ed edges). Attached to each round's checkpoint job via
    * observe — zero extra jobs. */
  private def signatureAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n"),
    coalesce(
      // BIT_XOR aggregate over a 64-bit edge hash
      expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x"))

  private def observedSignature(
      obs: org.apache.spark.sql.Observation): (Long, Long) = {
    val m = obs.get
    (m("n").asInstanceOf[Long], m("x").asInstanceOf[Long])
  }

  /** Per-document dedup decision over a vertex universe: columns
    * (`id`, `group_id`, `keep`) where `group_id` is the component minimum
    * (singletons: the doc itself) and `keep` marks the one representative
    * per group — the contract a training-data writer filters on.
    */
  def components(
      spark: SparkSession,
      edges: DataFrame, // columns: src, dst
      vertices: DataFrame // column: id
  ): DataFrame = {
    val (asg, _) = connectedComponentsWithStats(spark, edges)
    vertices
      .select(col("id"))
      .join(asg.withColumnRenamed("id", "aid"),
        col("id") === col("aid"), "left")
      .select(
        col("id"),
        coalesce(col("group_id"), col("id")).as("group_id"))
      .withColumn("keep", col("id") === col("group_id"))
  }
}
