package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** ConnectedComponents (alternating large-star / small-star) against
  * a driver-side union-find oracle — exact label parity on shaped and
  * random graphs. Test-only collects: inputs are tiny by design. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    ConnectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Union-find with min-id roots. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // attach the larger root under the smaller
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("path graph collapses to its minimum") {
    val edges = (1L until 8L).map(i => (i, i + 1))
    assert(run(edges) === edges.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> 1L).toMap)
  }

  test("two components + cycle + reversed-id star") {
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L),        // cycle, min 3
      (100L, 40L), (100L, 41L), (100L, 42L)) // star centered on the max id
    val got = run(edges)
    assert(got === Map(5L -> 3L, 3L -> 3L, 9L -> 3L,
      100L -> 40L, 40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("self-loops and empty input") {
    assert(run(Seq((7L, 7L))) === Map.empty)
    assert(run(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("maxIter exhaustion fails loudly instead of returning partial labels") {
    val edges = (1L until 40L).map(i => (i, i + 1))
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents(df, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(edges) === oracle(edges))
    }
  }

  test("hub + clique + random edges at moderate size match union-find") {
    val rnd = new scala.util.Random(11)
    val hub = (1L to 100L).map(i => (5000L, 5000L + i))        // max-id hub
    val clique = for (a <- 200L to 215L; b <- (a + 1) to 215L) yield (a, b)
    val rand = Seq.fill(600)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    val edges = hub ++ clique ++ rand
    assert(run(edges) === oracle(edges))
  }

  test("high-diameter chain with shuffled ids converges") {
    // worst case for naive propagation: a long path whose ids are a
    // fixed permutation, so mins travel against the id order
    val perm = new scala.util.Random(7).shuffle((0L until 64L).toVector)
    val edges = perm.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(edges)
    assert(got.values.toSet === Set(perm.min))
    assert(got.keySet === perm.toSet)
  }
}
