package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `hist_agg` sketch semantics: exact parity with a groupBy-bucket
  * count, partition-order independence (the exact-integer mergeable
  * state contract), edge-bucket clamping, NULL skipping, and the
  * loud rejection of fractional bucket widths. */
class HistAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hist(xs: Seq[Long], lo: Long, hi: Long, nbins: Int,
      parts: Int = 4): Seq[Long] = {
    import spark.implicits._
    xs.toDF("v").repartition(parts)
      .agg(Functions.hist_agg(col("v"), lo, hi, nbins).as("h"))
      .collect()(0).getSeq[Long](0).toList
  }

  test("matches a brute-force bucket count") {
    val xs = (0L until 1000L).map(i => (i * 37) % 640)
    val h = hist(xs, 0L, 640L, 8)
    val brute = (0 until 8).map(b => xs.count(x => x / 80 == b).toLong)
    assert(h === brute)
    assert(h.sum === 1000L)
  }

  test("partition-order independent: 1 partition == 13 partitions") {
    val xs = scala.util.Random.shuffle((0L until 5000L).map(_ % 997).toList)
    assert(hist(xs, 0L, 1000L, 100, parts = 1)
      === hist(xs, 0L, 1000L, 100, parts = 13))
  }

  test("out-of-range values clamp into the edge buckets") {
    val h = hist(Seq(-50L, -1L, 0L, 5L, 99L, 100L, 1000L), 0L, 100L, 10)
    // -50, -1, 0, 5 -> bucket 0 (x <= lo and [0,10)); 99 -> bucket 9;
    // 100, 1000 (>= hi) -> clamp to bucket 9
    assert(h(0) === 4L)
    assert(h(9) === 3L)
    assert(h.sum === 7L)
  }

  test("NULLs are skipped, empty input yields an all-zero histogram") {
    import spark.implicits._
    val h = Seq[Option[Long]](Some(5L), None, Some(15L)).toDF("v")
      .agg(Functions.hist_agg(col("v"), 0L, 20L, 2).as("h"))
      .collect()(0).getSeq[Long](0).toList
    assert(h === Seq(1L, 1L))
    val empty = Seq.empty[Long].toDF("v")
      .agg(Functions.hist_agg(col("v"), 0L, 20L, 2).as("h"))
      .collect()(0).getSeq[Long](0).toList
    assert(empty === Seq(0L, 0L))
  }

  test("fractional bucket widths are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Functions.hist_agg(col("v"), 0L, 100L, 3)
    }
    assert(e.getMessage.contains("divide evenly"))
  }

  test("SQL name works and agrees with the Scala API") {
    import spark.implicits._
    Functions.register(spark)
    Seq(1L, 2L, 300L).toDF("v").createOrReplaceTempView("hist_in")
    val viaSql = spark.sql(
      "SELECT hist_agg(v, 0, 400, 4) AS h FROM hist_in")
      .collect()(0).getSeq[Long](0).toList
    assert(viaSql === Seq(2L, 0L, 0L, 1L))
  }
}
