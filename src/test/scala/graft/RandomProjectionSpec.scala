package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Johnson-Lindenstrauss projection semantics (q123/q124): the ±1 sign
  * matrix derivation, projection linearity against a driver-side
  * replay, and the projected-ANN arm's consistency with scoring the
  * q123 projections directly. */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def signs: Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 16).map { j =>
      (0 until 64).map { i =>
        val hex = md.digest(s"rp,$i,$j".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1L else -1L
      }
    }
  }

  test("q123 equals a driver-side projection of the quantized vectors") {
    val q8 = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 200)
      .filter(!exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s = signs
    val want = (for {
      (id, v) <- q8.toSeq; j <- 0 until 16
    } yield (id, j.toLong, v.zip(s(j)).map { case (x, sg) => x * sg }.sum)).sorted
    val got = SparkEntry.queries("q123_rproj")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want)
  }

  test("q124 scores are exact dots of the projections; the sign matrix is ±1") {
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
    assert(signs.flatten.count(_ == 1L) > 300) // parity is roughly balanced
    val rows = SparkEntry.queries("q124_rproj_ann")(spark, sf).collect()
    assert(rows.length == 10)
    // monotone non-increasing scores, deterministic tie order
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q125 hits equal the overlap of the q49 and q124 top-10 id sets") {
    val exact = SparkEntry.queries("q49_qann")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val proj = SparkEntry.queries("q124_rproj_ann")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val r = SparkEntry.queries("q125_rproj_recall")(spark, sf).collect()(0)
    assert(r.getLong(0) == exact.intersect(proj).size.toLong)
    assert(r.getLong(1) == 10L)
  }
}
