package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

/** Bloom kernel semantics (graft.functions.BloomFilter): no false
  * negatives ever, false positives at the configured rate, build
  * determinism across partitionings, and the q52 bloom semi-join's
  * exactness against the plain semi-join. */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def buildDF(keys: Seq[Long], parts: Int, bits: Int = 1 << 17): Array[Byte] = {
    import spark.implicits._
    keys.toDF("k").repartition(parts)
      .agg(Functions.bloom_agg(col("k"), bits).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
  }

  test("no false negatives over 10k random keys") {
    val rnd = new scala.util.Random(1)
    val keys = Seq.fill(10000)(rnd.nextLong())
    val bf = buildDF(keys, 32)
    assert(keys.forall(Bloom.contains(bf, _)))
  }

  test("false positive rate near the configured bound") {
    val rnd = new scala.util.Random(2)
    val member = Seq.fill(10000)(rnd.nextLong()).distinct
    val bf = buildDF(member, 8)
    val memberSet = member.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(100000).toSeq
    val fp = probes.count(Bloom.contains(bf, _))
    // m=131072, n=10000, k=7 → theoretical fpp ≈ 0.21%; allow 5×
    assert(fp < 1000, s"false positive count $fp out of 100k probes")
    assert(fp >= 0)
  }

  test("build is independent of partitioning and insert order") {
    val keys = (0L until 5000L).map(i => i * 2654435761L)
    val a = buildDF(keys, 1)
    val b = buildDF(scala.util.Random.shuffle(keys), 32)
    assert(java.util.Arrays.equals(a, b))
  }

  test("empty build side rejects every probe") {
    import spark.implicits._
    val bf = Seq.empty[Long].toDF("k")
      .agg(Functions.bloom_agg(col("k"), 1 << 10).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    assert(!(0L until 1000L).exists(Bloom.contains(bf, _)))
  }

  test("SQL names registered: bloom_agg literal args validated") {
    GraftSession(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("bk")
    val bf = spark.sql("SELECT bloom_agg(k, 1024, 7) AS bf FROM bk")
      .collect()(0).getAs[Array[Byte]](0)
    assert(Bloom.contains(bf, 2L) && !Bloom.contains(bf, 99L))
    val hit = spark.sql(
      "SELECT bloom_contains((SELECT bloom_agg(k, 1024, 7) FROM bk), 3) AS c")
      .collect()(0).getBoolean(0)
    assert(hit)
  }

  test("q52 bloom semi-join equals the plain semi-join") {
    val got = SparkEntry.queries("q52_bloom")(spark, sf)
    val keys = Tables.customer(spark, sf).filter(col("c_nationkey") === 1)
      .select(col("c_custkey"))
    val want = Tables.orders(spark, sf)
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("analysis-time validation: bad key type and bad params fail cleanly") {
    import spark.implicits._
    val df = Seq("x").toDF("s")
    val e1 = intercept[Exception] {
      df.agg(Functions.bloom_agg(col("s").cast("string").cast("binary").cast("string").isNotNull.cast("long"), 0)).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("numbits"))
    val e2 = intercept[Exception] {
      df.select(Functions.bloom_contains(col("s"), lit(1L))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("bloom_contains"))
  }
}
