package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BoundedPair

/** The pair-budget guard's three contracts: (1) under budget it is a
  * provable no-op (refined key ≡ raw bucket — what keeps the sf0.01
  * oracles byte-identical), (2) over budget it bounds sub-bucket
  * membership near the budget, (3) rows that agree on ALL refinement
  * bits are never separated at any depth (the dupes-subset invariant
  * the dedup call sites rely on). */
class BoundedPairSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(n: Int, buckets: Int) =
    spark.range(n).select(col("id"),
      pmod(col("id"), lit(buckets.toLong)).as("bucket"),
      pmod(xxhash64(col("id")), lit(1L << BoundedPair.MaxBits)).as("ref"))

  test("under budget the refined key IS the bucket: classes unchanged, sub = 0") {
    val d = BoundedPair.refined(df(400, 4), "bucket", "ref", "pb", budget = 256)
    assert(d.filter(col("pb.sub") =!= 0L).count() === 0)
    // bucket → refined key is a bijection
    assert(d.select("bucket", "pb").distinct().count() === 4)
  }

  test("over budget: sub-buckets bounded, equal-ref rows never separated") {
    // one mega-bucket of 4096 rows with uniform 16-bit refinement
    val d = BoundedPair.refined(df(4096, 1), "bucket", "ref", "pb", budget = 256)
    val sizes = d.groupBy("pb").count().select("count").as[Long].collect()
    assert(sizes.sum === 4096L)
    // e = ceil(log2(4096/256)) = 4 → 16 cells expected near 256 each;
    // allow generous hash-skew headroom
    assert(sizes.length >= 8, s"expected ≥ 8 sub-buckets, got ${sizes.length}")
    assert(sizes.max <= 4 * 256, s"max sub-bucket ${sizes.max} way over budget")
    // the dupes-subset invariant: same (bucket, ref) ⇒ same refined key
    val split = d.groupBy("bucket", "ref")
      .agg(countDistinct(col("pb")).as("nk")).filter(col("nk") > 1).count()
    assert(split === 0)
  }

  test("pair join on the refined key equals the bucket join under budget") {
    val base = df(300, 3)
    val d = BoundedPair.refined(base, "bucket", "ref", "pb", budget = 256)
    val viaBucket = base.as("a").join(base.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id")).count()
    val viaKey = d.as("a").join(d.as("b"),
      col("a.pb") === col("b.pb") && col("a.id") < col("b.id")).count()
    assert(viaKey === viaBucket)
  }

  test("deeper refinement only narrows: refined-key pairs ⊆ bucket pairs") {
    val base = df(2048, 2) // 1024 per bucket: guard engages at budget 256
    val d = BoundedPair.refined(base, "bucket", "ref", "pb", budget = 256)
    val keyPairs = d.as("a").join(d.as("b"),
        col("a.pb") === col("b.pb") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val bucketPairs = base.as("a").join(base.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(keyPairs.subsetOf(bucketPairs))
    assert(keyPairs.size < bucketPairs.size) // it actually engaged
  }
}
