package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, KMeans}

/** The persisted-IVF scale contract (q72/q74's "cid is a partition
  * column at 100 TB"), proven on a real write+read cycle: the probe
  * scan carries PartitionFilters (pruning happens at file-listing
  * time, before any byte is read) and returns exactly the rows the
  * on-the-fly assignment produces. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def walk(sp: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = sp match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      walk(a.executedPlan)
    case other => other +: other.children.flatMap(walk)
  }

  test("probe scan partition-prunes and matches the on-the-fly assignment") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("ivfindex").toString
    try {
      val qemb = Tables.embeddings(spark, sf)
        .filter(!exists(col("embedding"), _.isNull))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      IvfIndex.write(qemb, model, dir)

      val probes = Seq(1L, 3L)
      val probed = IvfIndex.probe(spark, dir, probes)

      // plan pin: the cid predicate became PartitionFilters on the scan
      // (listing-time pruning), not a post-scan data filter
      val scans = walk(probed.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"probe scan has no PartitionFilters:\n${probed.queryExecution.executedPlan}")

      // result parity with the unpersisted assignment path
      val expected = qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .filter(col("cid").isin(probes: _*))
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = probed.select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      assert(got.nonEmpty && got.size <
        qemb.count(), "probe should be a strict subset")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("append merges a new batch into the partition layout without rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    try {
      val qemb = Tables.embeddings(spark, sf)
        .filter(!exists(col("embedding"), _.isNull))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      val base = qemb.filter(col("vec_id") % 2 === 0)
      val batch = qemb.filter(col("vec_id") % 2 === 1)
      IvfIndex.write(base, model, dir)
      IvfIndex.append(batch, model, dir)
      val probes = Seq(1L, 3L)
      val got = IvfIndex.probe(spark, dir, probes)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .filter(col("cid").isin(probes: _*))
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
