package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, KMeans}

/** Streaming IVF index maintenance, end to end: `IvfIndex.append` /
  * `delete` / `compact` composed under LIVE streams — a foreachBatch
  * ingest stream interleaved with a tombstone stream and scheduled
  * compactions, the way StreamingNearDupSpec drives the band history.
  * The invariant: after every interleaving step, the maintained
  * index's probe output equals BIT-FOR-BIT the probe of an index
  * batch-built from scratch over the currently-live vector set with
  * the same frozen model (file layout may differ; rows may not). */
class StreamingIvfMaintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def qemb = Tables.embeddings(spark, sf)
    .filter(!exists(col("embedding"), _.isNull))
    .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))

  test("probe tracks a batch-built index bit-for-bit across streamed append/delete/compact") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val refDir = java.nio.file.Files.createTempDirectory("ivfstreamref").toString
    try {
      val all = qemb.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val (init, rest) = all.partition(_._1 % 10 < 7)
      val (batch1, batch2) = rest.splitAt(rest.length / 2)
      assert(init.nonEmpty && batch1.nonEmpty && batch2.nonEmpty)

      // model trained ONCE on the initial corpus and frozen — append
      // assigns new batches with it (retrain is a separate lifecycle)
      val initDf = init.toSeq.toDF("vec_id", "q8")
      val seeds = KMeans.seedsFromIds(initDf, "vec_id", "q8",
        init.map(_._1).sorted.take(8).toSeq)
      val model = KMeans.train(initDf, "vec_id", "q8", 64, seeds, maxIter = 2)
      IvfIndex.write(initDf, model, dir)

      val live = scala.collection.mutable.Set(init.map(_._1): _*)
      def probeRows(path: String): Set[(Long, Long, Seq[Long])] = {
        val cids = spark.read.parquet(path).select("cid").distinct()
          .collect().map(_.getAs[Number]("cid").longValue).toSeq
        IvfIndex.probe(spark, path, cids)
          .select("vec_id", "cid", "q8").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
      }
      // the reference: a from-scratch index over the live set (refDir
      // wiped first — a stale cid partition from the previous rebuild
      // must not leak into the comparison)
      def referenceRows(): Set[(Long, Long, Seq[Long])] = {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(refDir))
        val liveDf = all.filter(t => live(t._1)).toSeq.toDF("vec_id", "q8")
        IvfIndex.write(liveDf, model, refDir)
        probeRows(refDir)
      }
      def assertTracks(stage: String): Unit =
        assert(probeRows(dir) === referenceRows(),
          s"maintained index diverged from the batch-built reference after $stage")

      // the ingest stream appends each micro-batch with the frozen model
      val ingest = MemoryStream[(Long, Seq[Long])]
      val qIngest = ingest.toDF().toDF("vec_id", "q8")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfIndex.append(batch, model, dir)
        }.start()
      // the tombstone stream registers deletions
      val tombs = MemoryStream[Long]
      val qTombs = tombs.toDF().toDF("vec_id")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.collect().map(_.getLong(0)).toSeq
          IvfIndex.delete(spark, dir, ids)
        }.start()

      try {
        // 1. stream in batch1
        ingest.addData(batch1.toSeq); qIngest.processAllAvailable()
        live ++= batch1.map(_._1)
        assertTracks("streamed append of batch1")

        // 2. stream tombstones: one initial-corpus vector, one from
        //    batch1 — masked merge-on-read, no compaction yet
        val dead1 = Seq(init.head._1, batch1.head._1)
        tombs.addData(dead1: _*); qTombs.processAllAvailable()
        live --= dead1
        assertTracks("streamed deletes (masked, pre-compaction)")

        // 3. scheduled compaction folds the mask into the files
        IvfIndex.compact(spark, dir)
        assert(IvfIndex.tombstones(spark, dir).isEmpty,
          "compaction must consume the pending tombstones")
        assertTracks("compaction")

        // 4. more ingest AFTER a compaction
        ingest.addData(batch2.toSeq); qIngest.processAllAvailable()
        live ++= batch2.map(_._1)
        assertTracks("streamed append of batch2 post-compaction")

        // 5. delete from the fresh batch, compact again
        val dead2 = Seq(batch2.last._1)
        tombs.addData(dead2: _*); qTombs.processAllAvailable()
        live --= dead2
        assertTracks("second streamed delete")
        IvfIndex.compact(spark, dir)
        assertTracks("second compaction")
      } finally { qIngest.stop(); qTombs.stop() }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(refDir))
    }
  }
}
