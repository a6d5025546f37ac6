package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, KMeans}
import graft.queries.DedupQueries

/** Deletion lifecycle on the PERSISTED artifacts (the q262 story
  * continued past the label table): merge-on-read tombstones must hide
  * deleted rows immediately, and compaction must fold them in without
  * touching what it doesn't have to — partition-pruned for the IVF
  * index, full-rewrite-by-design (amortized) for the band history. */
class ForgetArtifactsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def qemb = Tables.embeddings(spark, sf)
    .filter(!exists(col("embedding"), _.isNull))
    .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))

  private def listFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    if (!d.exists) Map.empty
    else d.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap
  }

  test("IVF delete masks immediately; compact rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfforget").toString
    try {
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      IvfIndex.write(qemb, model, dir)

      val byCid = qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      // wipe one whole partition, nibble one vector from another,
      // leave a third untouched
      val cids = byCid.keys.toSeq.sorted
      assert(cids.size >= 3, "need >=3 populated partitions for this test")
      val (wiped, nibbled, untouched) = (cids(0), cids(1), cids(2))
      val dead = byCid(wiped) + byCid(nibbled).head
      val untouchedFiles = listFiles(s"$dir/cid=$untouched")
      assert(untouchedFiles.nonEmpty)

      IvfIndex.delete(spark, dir, dead.toSeq)
      // merge-on-read: every probe hides the dead set with no rewrite
      val probed = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val live = byCid.values.flatten.toSet -- dead
      assert(probed === live, "tombstoned vectors leaked through the probe")

      IvfIndex.compact(spark, dir)
      // tombstones consumed; probe parity holds post-compaction
      assert(IvfIndex.tombstones(spark, dir).isEmpty)
      val after = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(after === live, "compaction changed the visible row set")
      // partition-pruned copy-on-write: the untouched partition's
      // files are byte-identical, the wiped partition is gone
      assert(listFiles(s"$dir/cid=$untouched") === untouchedFiles,
        "compaction rewrote a partition with no tombstones")
      assert(!new java.io.File(s"$dir/cid=$wiped").exists,
        "fully-tombstoned partition should be dropped")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("history tombstones mask probes immediately; compaction folds them in") {
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "faspec_hist", buckets = 8)
      val base = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(base.nonEmpty, "no near-dup pairs at this SF — test is vacuous")

      // forget one matched history doc; every pair it anchored must go
      val deadDoc = base.head._1
      val want = base.filterNot(_._1 == deadDoc)
      import spark.implicits._
      DedupQueries.tombNearDupHistory(spark, "faspec_hist",
        Seq(deadDoc).toDF("doc_id"))
      val masked = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(masked === want, "merge-on-read mask diverged from the filtered pair set")

      val rowsBefore = spark.table("faspec_hist").count()
      DedupQueries.compactNearDupHistory(spark, "faspec_hist", buckets = 8)
      assert(!spark.catalog.tableExists("faspec_hist_tombs"),
        "compaction must consume the tombstone table")
      // the doc's 6 band rows left the table; probe output is unchanged
      assert(spark.table("faspec_hist").count() === rowsBefore - 6)
      val after = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(after === want, "compaction changed the probe result")
    } finally {
      spark.sql("DROP TABLE IF EXISTS faspec_hist")
      spark.sql("DROP TABLE IF EXISTS faspec_hist_tombs")
    }
  }
}
