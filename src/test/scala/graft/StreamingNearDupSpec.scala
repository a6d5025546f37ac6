package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** Streaming near-dup ingest gate: the persisted bucketed LSH history
  * probed per MICRO-BATCH (foreachBatch — the production crawl-ingest
  * pattern). Because the probe is stateless given the history table
  * (each new doc's verdict depends only on itself and history), the
  * union of per-batch flags must equal the one-shot batch probe
  * EXACTLY, no matter how the stream slices the batch. */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("micro-batched ingest flags exactly the batch probe's pairs") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // clear both the metastore entry and any orphan location a
    // previous JVM left behind (saveAsTable refuses a stray dir)
    spark.sql("DROP TABLE IF EXISTS sndspec_hist")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "sndspec_hist")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (wh.exists()) rm(wh)
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "sndspec_hist", buckets = 8)
    val expected = DedupQueries.incNearDupsAgainstHistory(spark, sf, "sndspec_hist")
      .select("hist_doc", "new_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val newDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val flagged = scala.collection.mutable.Set.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hits = DedupQueries
          .nearDupsAgainstHistoryOf(spark, batch, sf, "sndspec_hist")
          .select("hist_doc", "new_doc").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        flagged.synchronized { flagged ++= hits }
        ()
      }
      .start()
    try {
      // uneven slices on purpose: the identity must hold under any split
      newDocs.grouped(math.max(1, newDocs.size / 3 + 1)).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()

    assert(flagged.toSet === expected,
      s"stream flags ${flagged.size} pairs, batch probe ${expected.size}")
    assert(expected.nonEmpty, "test corpus produced no near-dup pairs — vacuous")
    } finally spark.sql("DROP TABLE IF EXISTS sndspec_hist")
  }

  test("a tombstone stream stops subsequent ingest batches from matching the dead doc") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS sndtomb_hist")
    spark.sql("DROP TABLE IF EXISTS sndtomb_hist_tombs")
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "sndtomb_hist", buckets = 8)
      val expected = DedupQueries.incNearDupsAgainstHistory(spark, sf, "sndtomb_hist")
        .select("hist_doc", "new_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val newDocs = Tables.documents(spark, sf)
        .filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val (sliceA, sliceB) = newDocs.splitAt(newDocs.size / 2)
      val bIds = sliceB.map(_._1).toSet
      // the takedown target: a history doc that would anchor a match
      // in the SECOND half — so the test can observe the mask engage
      val deadDoc = expected.collectFirst { case (h, n) if bIds(n) => h }
        .getOrElse(fail("no pair lands in slice B — split the corpus differently"))

      val flagged = scala.collection.mutable.Set.empty[(Long, Long)]
      val ingest = MemoryStream[(Long, String)]
      val qIngest = ingest.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val hits = DedupQueries
            .nearDupsAgainstHistoryOf(spark, batch, sf, "sndtomb_hist")
            .select("hist_doc", "new_doc").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          flagged.synchronized { flagged ++= hits }
          ()
        }.start()
      val tombs = MemoryStream[Long]
      val qTombs = tombs.toDF().toDF("doc_id")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          DedupQueries.tombNearDupHistory(spark, "sndtomb_hist", batch)
        }.start()
      try {
        ingest.addData(sliceA); qIngest.processAllAvailable()
        tombs.addData(deadDoc); qTombs.processAllAvailable()
        ingest.addData(sliceB); qIngest.processAllAvailable()
      } finally { qIngest.stop(); qTombs.stop() }

      val aIds = sliceA.map(_._1).toSet
      val want = expected.filter { case (h, n) => aIds(n) || h != deadDoc }
      assert(flagged.toSet === want,
        "post-tombstone batches must skip the dead doc; pre-tombstone flags stand")
      // the mask had to actually change something or the test is vacuous
      assert(expected.exists { case (h, n) => h == deadDoc && bIds(n) })
    } finally {
      spark.sql("DROP TABLE IF EXISTS sndtomb_hist")
      spark.sql("DROP TABLE IF EXISTS sndtomb_hist_tombs")
    }
  }
}
