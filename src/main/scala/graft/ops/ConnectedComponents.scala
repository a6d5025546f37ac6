package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components over an edge list — the cluster
  * step of the dedup family. Near-dup PAIRS (q18/q20/q21) are only
  * half the dedup story: a real pipeline groups pairs into clusters
  * and keeps one representative per cluster. This op turns pairs into
  * `(node, component)` labels where `component` is the smallest node
  * id in the component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * canonical shuffle-bounded formulation:
  *   - large-star: each node connects its strictly-LARGER neighbors
  *     to the minimum of its neighborhood (including itself);
  *   - small-star: each node (edges oriented big→small) connects its
  *     smaller neighbors and itself to that minimum.
  * Both steps preserve connectivity exactly; alternation converges to
  * a star forest (every node pointing at its component's minimum) in
  * O(log² n) rounds worst-case, a handful in practice.
  *
  * 100 TB shape: per round the shuffle carries only (long, long) id
  * pairs — never document payloads — and the per-node minimum is a
  * partial-aggregatable `groupBy().min()` (map-side combine), so a
  * viral near-dup cluster (one node with millions of neighbors) costs
  * a skewed-but-AQE-splittable equi-join, not a reduce-side
  * neighborhood materialization. Each round ends in a [[Barrier]]:
  * without it the lineage grows by ~6 plan nodes per round and the
  * whole prefix re-executes on every convergence-check action.
  *
  * Nodes that appear in no edge (singletons) are absent from the
  * output — callers left-join and coalesce to the node's own id.
  */
object ConnectedComponents {

  /** @param edges first two columns are the (undirected) edge
    *              endpoints, castable to long; self-loops ignored.
    * @return DataFrame `(node: long, component: long)` with one row
    *         per node that appears in at least one non-loop edge.
    */
  def apply(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val c = edges.columns
    var e = Barrier(canon(edges.select(
      col(c(0)).cast(LongType).as("u"), col(c(1)).cast(LongType).as("v"))))
    var sig = signature(e)
    var converged = sig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = Barrier(smallStar(largeStar(e)))
      val nsig = signature(next)
      // one cheap aggregate per round; the exact (shuffling) anti-join
      // containment check runs only on signature-stable rounds — a
      // changed (count, hash-sum) proves non-convergence outright, and
      // the confirming join keeps correctness independent of the hash
      converged = nsig == sig &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      e = next
      sig = nsig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    // converged star forest (canonical u > v): members appear as u
    // exactly once, the root only ever as v.
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Order-independent edge-set fingerprint: (count, xor of per-edge
    * 64-bit hashes) in a single map-side-combined aggregate job —
    * bit_xor can't overflow under ANSI and the edge set is distinct,
    * so every edge contributes exactly once. */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Canonical big→small orientation, loops dropped, distinct. */
  private def canon(e: DataFrame): DataFrame =
    e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()

  /** For each node u over the SYMMETRIC neighborhood: emit
    * (v, min(N(u) ∪ {u})) for every neighbor v > u. Output is
    * canonical by construction (v > u ≥ m). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Edges oriented big→small: connect each center's smaller
    * neighbors (and the center) to the neighborhood minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    val moved = e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    moved.union(mins.select(col("u"), col("m").as("v"))).distinct()
  }
}
