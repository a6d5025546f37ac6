package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch semantics: partitioning-invariant counters (merge
  * is elementwise add), the never-underestimate guarantee for every
  * item in the stream, counter-sum conservation, and q118's est ≥ cnt
  * invariant on real data. */
class CmsAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  private val P = 2147483647L

  /** zipf-ish long-hash stream: item i appears ~n/(i+1) times. */
  private def stream(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((0 until 40).flatMap(i => Seq.fill(n / (i + 1))(i * 7919L + 13L)))
  }

  private def sketch(xs: Seq[Long], parts: Int): Seq[Long] = {
    import spark.implicits._
    xs.toDF("h").repartition(parts)
      .agg(Functions.cms_agg(col("h"), 4, 64).as("c"))
      .collect()(0).getSeq[Long](0)
  }

  private def estimate(cms: Seq[Long], h: Long, width: Int): Long =
    (0 until 4).map { r =>
      val a = (1103515245L * (r + 1) + 12345L) % P
      cms(r * width + ((a * (h % P) + 977L * (r + 1)) % P % width).toInt)
    }.min

  test("counters are partitioning-invariant and conserve the stream size") {
    val xs = stream(3000, 1)
    val ref = sketch(xs, 1)
    for (parts <- Seq(7, 32)) assert(sketch(xs, parts) == ref, s"parts=$parts")
    // every row of the sketch sums to the total item count
    (0 until 4).foreach { r =>
      assert(ref.slice(r * 64, (r + 1) * 64).sum == xs.size.toLong, s"row $r")
    }
  }

  test("point estimates never under-count any stream item") {
    val xs = stream(2500, 2)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cms = sketch(xs, 8)
    exact.foreach { case (h, c) =>
      assert(estimate(cms, h, 64) >= c, s"item $h under-counted")
    }
  }

  test("q118: est >= cnt for every watch term, exact for heavy ones") {
    val rows = SparkEntry.queries("q118_cms")(spark, sf).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"${r.getString(0)} under-estimated")
    }
    // the absent sentinel exists with exact count 0
    val absent = rows.find(_.getString(0) == "zzqqabsent").get
    assert(absent.getLong(2) == 0L)
  }
}
