package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration by degree-oriented wedge closure
  * (Cohen, "Graph Twiddling in a MapReduce World", CiSE 2009; the
  * same orientation underlies Schank-Wagner forward counting).
  *
  * Input: undirected edges as (u, v) BIGINT rows with u < v, distinct
  * (the near-dup pair convention). Output: one row per triangle with
  * its three nodes as (a, b, c), a < b < c.
  *
  * Scale shape: every edge is oriented AWAY from its lower-(degree,
  * id) endpoint, wedges form only at a node's OUT-edges, and a wedge
  * (s→x, s→y) closes iff the oriented edge x→y exists. The total-order
  * orientation makes each triangle appear exactly once (at its
  * lowest-(degree, id) corner) and bounds every out-degree by O(√|E|):
  * a celebrity hub contributes NO wedges at its own node because all
  * its edges point away from lower-degree neighbors toward it — the
  * join that goes quadratic in the naive a<b<c formulation stays
  * collision-bound here. Shuffles carry only fixed-width id/degree
  * longs; the closing join keys on (x, y) id pairs.
  */
object Triangles {
  def apply(edges: DataFrame): DataFrame = {
    val e = Barrier(edges.toDF("u", "v"))
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val dd = e
      .join(deg.toDF("u", "du"), "u")
      .join(deg.toDF("v", "dv"), "v")
    val o = dd.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    val w = o.toDF("s", "x", "dx").join(o.toDF("s", "y", "dy"), "s")
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
    val tri = w.join(o.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
    tri.select(array_sort(array(col("s"), col("x"), col("y"))).as("tr"))
      .select(element_at(col("tr"), 1).as("a"), element_at(col("tr"), 2).as("b"),
        element_at(col("tr"), 3).as("c"))
  }
}
