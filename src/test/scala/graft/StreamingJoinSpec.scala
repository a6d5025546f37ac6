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

  test("left-outer interval join emits null-extended rows when the watermark closes the window") {
    // LEFT OUTER is the stream-stream mode with real eviction
    // semantics: an unmatched left row may only emit (with nulls)
    // once the watermark proves no right row can still arrive. A
    // far-future sentinel row on both sides pushes the watermark past
    // every join window so the final AvailableNow batch flushes ALL
    // pending outer rows — making the result exactly comparable to
    // the batch left join.
    val dirA = tmp("ssoj-a"); val dirB = tmp("ssoj-b")
    stage(dirA, "part-0.parquet")
    stage(dirB, "part-0.parquet")
    val maxNs = Tables.events(spark, sf).agg(max(col("ts_ns"))).head().getLong(0)
    // TWO staggered far-future sentinels (the source runs
    // maxFilesPerTrigger=1, and outer-row eviction in batch N uses
    // the watermark committed after batch N−1): whichever sentinel
    // batch runs LAST evicts with a watermark already a day past
    // every real row, so all real left rows flush during DATA batches
    // — no reliance on a trailing no-data batch. Sentinels themselves
    // are excluded from the comparison (ids < 0).
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def sentinel(id: Long, days: Long) = raw.limit(1).select(
      lit(id).as("event_id"),
      timestamp_micros(lit(maxNs / 1000L + days * 86400L * 1000000L))
        .cast(raw.schema("ts").dataType).as("ts"),
      lit(id).as("user_id"),
      lit("sentinel").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
    // sentinel ids are MULTIPLES OF 7: the right side's id filter is
    // a deterministic predicate, so Catalyst pushes it BELOW the
    // EventTimeWatermark node — a sentinel failing the filter would
    // never reach side B's watermark tracker and the global watermark
    // (min across sides) would stall forever. Found the hard way.
    Seq(sentinel(-7L, 1L), sentinel(-14L, 2L)).foreach { sdf =>
      sdf.write.mode("append").parquet(dirA)
      sdf.write.mode("append").parquet(dirB)
    }

    def side(dir: String, s: String) = NozzlePipeline.source(spark, dir)
      .select(col("user_id").as(s"u$s"), col("event_id").as(s"id$s"),
        timestamp_micros(expr("ts_ns div 1000")).as(s"t$s"))
      .withWatermark(s"t$s", "1 minute")

    // right side: purchases only → plenty of unmatched left rows
    val right = side(dirB, "b").filter(col("idb") % 7 === 0)
    val j = side(dirA, "a").join(right,
      expr("ua = ub AND tb BETWEEN ta AND ta + interval 10 minutes AND ida <> idb"),
      "leftOuter")
      .select(col("ida"), col("idb"))
    val q = j.writeStream
      .format("memory").queryName("ssoj_stream")
      .option("checkpointLocation", tmp("ssoj-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssoj_stream").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
      .filter(_._1 >= 0)
      .toSet

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).as("t"))
    val want = ev.toDF("ua", "ida", "ta").join(
        ev.toDF("ub", "idb", "tb").filter(col("idb") % 7 === 0),
        expr("ua = ub AND tb BETWEEN ta AND ta + interval 10 minutes AND ida <> idb"),
        "left_outer")
      .select(col("ida"), col("idb"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
      .toSet

    assert(want.exists(_._2 == Long.MinValue), "no unmatched left rows — weak test")
    assert(got == want,
      s"left-outer stream join diverged: ${got.size} vs ${want.size} rows; " +
        s"missing=${(want -- got).take(20)} extra=${(got -- want).take(20)}")
  }
}
