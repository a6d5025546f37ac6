package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle enumeration semantics: exactly-once output with a < b < c,
  * agreement with a brute-force closure on random graphs (including a
  * hub-skewed one — the case the degree orientation exists for), and
  * the q119 pin against the oracle graph shape. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    ops.Triangles(edges.toDF("u", "v"))
      .orderBy("a", "b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def brute(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es((a min b, a max b))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      a <- nodes; b <- nodes if a < b && has(a, b)
      c <- nodes if b < c && has(b, c) && has(a, c)
    } yield (a, b, c)).sorted
  }

  test("K4 has four triangles; chains and stars have none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(k4) == brute(k4))
    assert(run(k4).size == 4)
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(run((2L to 9L).map(i => (1L, i))).isEmpty)
  }

  test("random graph matches brute force") {
    val rnd = new scala.util.Random(11)
    val edges = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L if rnd.nextDouble() < 0.15
    } yield (a, b)).toSeq
    assert(run(edges) == brute(edges))
  }

  test("hub-skewed graph matches brute force (orientation case)") {
    // one hub connected to everyone + a sparse ring among the leaves
    val hub = (1L to 60L).map(i => (0L, i))
    val ring = (1L until 60L).map(i => (i, i + 1)) :+ (1L, 60L)
    val edges = (hub ++ ring.map { case (a, b) => (a min b, a max b) }).distinct
    assert(run(edges) == brute(edges))
    assert(run(edges).nonEmpty)
  }

  test("q119 equals the direct closure over q18 pairs") {
    val sf = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("q18_minhash")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("q119_triangles")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute(pairs))
  }
}
