package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NozzlePipeline

/** Stream-stream joins — the last Structured Streaming operator family
  * (windows, sessions, dedup, arbitrary state, and streaming sketches
  * are covered elsewhere): a watermarked interval equi-join between two
  * event streams must emit exactly the batch join's rows. The interval
  * bound is what makes the state store finite — each side buffers only
  * rows inside the watermark + join-range horizon, the property that
  * lets the join run forever at 100 TB/day. */
class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def stage(dir: String, name: String): Unit =
    Files.copy(Paths.get(s"$sf/events.parquet"), Paths.get(s"$dir/$name"),
      StandardCopyOption.REPLACE_EXISTING)

  test("watermarked interval join equals the batch join") {
    val dirA = tmp("ssj-a"); val dirB = tmp("ssj-b")
    stage(dirA, "part-0.parquet")
    stage(dirB, "part-0.parquet")
    def side(dir: String, s: String) = NozzlePipeline.source(spark, dir)
      .select(col("user_id").as(s"u$s"), col("event_id").as(s"id$s"),
        timestamp_micros(expr("ts_ns div 1000")).as(s"t$s"))
      .withWatermark(s"t$s", "1 minute")
    val j = side(dirA, "a").join(side(dirB, "b"),
      expr("ua = ub AND tb BETWEEN ta AND ta + interval 1 hour AND ida < idb"))
      .select(col("ida"), col("idb"))
    val q = j.writeStream
      .format("memory").queryName("ssj_stream")
      .option("checkpointLocation", tmp("ssj-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ssj_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).as("t"))
    val want = ev.toDF("ua", "ida", "ta").join(ev.toDF("ub", "idb", "tb"),
        expr("ua = ub AND tb BETWEEN ta AND ta + interval 1 hour AND ida < idb"))
      .select(col("ida"), col("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(want.nonEmpty, "test window produced no pairs — widen the interval")
    assert(got == want, s"stream join diverged: ${got.size} vs ${want.size} pairs")
  }

  test("stream-static dimension join matches the batch join") {
    val dir = tmp("ssd-src")
    stage(dir, "part-0.parquet")
    // static dimension: a deterministic per-user tier table — the
    // broadcast-dim enrichment every streaming pipeline does
    val dim = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("tier", pmod(col("user_id"), lit(3)))
    val q = NozzlePipeline.source(spark, dir)
      .select(col("event_id"), col("user_id"))
      .join(dim, "user_id")
      .writeStream
      .format("memory").queryName("ssd_stream")
      .option("checkpointLocation", tmp("ssd-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ssd_stream").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    val want = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id")).join(dim, "user_id")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
