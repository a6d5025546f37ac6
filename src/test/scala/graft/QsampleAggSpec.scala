package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantile-sketch properties: partition-invariance (the mergeable-
  * state contract — identical sample under any partitioning), exact
  * agreement with a brute-force bottom-k-by-(hash, tie) computation,
  * small-group exactness (sample = whole group below k), per-group
  * independence, and the order-statistic quantile arithmetic the
  * q264 oracle replays in DuckDB. */
class QsampleAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // rows (h, tie, v): h from the engine's md5-prefix domain over the
  // row id so the sample is a uniform subset; v is an arbitrary long.
  private def rows(n: Int, g: Int = 1) = {
    import spark.implicits._
    (1 to n).toDF("id").select(
      (col("id") % g).as("grp"),
      expr("cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint)")
        .as("h"),
      col("id").cast("long").as("tie"),
      (col("id") * 37L % 1000L).as("v"))
  }

  private def sampleOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Seq[Long]] =
    df.groupBy("grp")
      .agg(graft.Functions.qsample_agg(col("h"), col("tie"), col("v"), k).as("s"))
      .orderBy("grp")
      .collect().toSeq.map(_.getSeq[Long](1))

  test("partition-invariant: 1, 7, and 32 partitions give the same sample") {
    val base = rows(5000).cache()
    try {
      val s1 = sampleOf(base.coalesce(1), 128)
      val s7 = sampleOf(base.repartition(7), 128)
      val s32 = sampleOf(base.repartition(32), 128)
      assert(s1 === s7)
      assert(s1 === s32)
    } finally { base.unpersist(); () }
  }

  test("equals brute-force bottom-k by (h, tie), values ascending") {
    val df = rows(3000)
    val got = sampleOf(df, 64).head
    val want = df.orderBy("h", "tie").limit(64)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
    assert(got.length === 64)
  }

  test("group smaller than k returns the whole group, exactly sorted") {
    val df = rows(40)
    val got = sampleOf(df, 128).head
    val want = df.select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
  }

  test("groups sample independently") {
    val df = rows(4000, g = 4).cache()
    try {
      val whole = sampleOf(df, 32)
      (0 until 4).foreach { g =>
        val alone = sampleOf(df.filter(col("grp") === g), 32)
        assert(whole(g) === alone.head, s"grp=$g")
      }
    } finally { df.unpersist(); () }
  }

  test("order-statistic quantile arithmetic matches a driver-side replay") {
    val df = rows(5000)
    val out = df.withColumn("grp", lit(0L)).groupBy("grp")
      .agg(graft.Functions.qsample_agg(col("h"), col("tie"), col("v"), 128).as("samp"))
      .select(
        expr("element_at(samp, cast(1 + (50 * (size(samp) - 1)) div 100 as int))").as("p50"),
        expr("element_at(samp, cast(1 + (99 * (size(samp) - 1)) div 100 as int))").as("p99"))
      .head()
    val samp = sampleOf(df.withColumn("grp", lit(0L)), 128).head
    assert(out.getLong(0) === samp(50 * 127 / 100))
    assert(out.getLong(1) === samp(99 * 127 / 100))
  }

  test("rejects non-BIGINT input loudly") {
    val e = intercept[Exception] {
      rows(10).select(graft.Functions.qsample_agg(
        col("h").cast("int"), col("tie"), col("v"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}
