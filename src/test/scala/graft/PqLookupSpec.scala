package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Negative test for the PQ codebook lookup (q69/q70 path): with a
  * HOLE in the cid range (centroid 5 dropped) a positional
  * `element_at(cb, code)` reads the wrong centroid for every code >= 6,
  * while the cid-keyed lookup stays correct. This is the regression
  * the oracle parity harness CANNOT catch — a positional shift would
  * be identical in both engines — so it is pinned here instead.
  */
class PqLookupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  test("ADC top-10 matches cid-keyed brute force when centroid 5 is dropped") {
    val emb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
    val cids = Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L)

    val got = graft.queries.SimilarityQueries
      .pqAdc(emb, col("vec_id").isin(cids: _*))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adist")))

    val vecs = emb.select("vec_id", "embedding").collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)
    }.toMap
    val cents = cids.map(c => c -> vecs(c)).toMap
    val qv = vecs(0L)

    def sub(v: Array[Double], m: Int): Array[Double] = v.slice(m * 16, m * 16 + 16)
    def codes(v: Array[Double]): Seq[Long] =
      (0 until 4).map(m => cids.map(c => (d2(sub(v, m), sub(cents(c), m)), c)).min._2)
    def adist(v: Array[Double]): Double =
      (0 until 4).map(m => d2(sub(qv, m), sub(cents(codes(v)(m)), m))).sum

    val want = vecs.keys.filter(_ != 0L).toSeq
      .map(id => (id, adist(vecs(id))))
      .sortBy { case (id, d) => (d, id) }
      .take(10)

    assert(got.map(_._1).toSeq === want.map(_._1),
      s"top-10 ids diverge: got ${got.map(_._1).mkString(",")} want ${want.map(_._1).mkString(",")}")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)), s"adist $g != $w")
    }

    // Guard against a vacuous pass: the hole only bites when some
    // top-10 vector actually encodes to a cid past it.
    val usedCodes = want.flatMap { case (id, _) => codes(vecs(id)) }.toSet
    assert(usedCodes.exists(_ >= 6L),
      s"no top-10 vector used a centroid past the hole (codes: $usedCodes) — test is vacuous")
  }
}
