package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.streaming.{NozzlePipeline, Stats}

/** O4 — slow-consumer detector: predicate parity with go-nozzle
  * detector.go:116-124 and the streaming alert side-output. */
class DetectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def empty = Envelope(None, None, None, None, None, None, None,
    None, None, None, None, None, None, None)

  private def truncation = empty.copy(
    origin = Some("doppler"), eventType = Some(7), timestamp = Some(1L),
    counterEvent = Some(CounterEvent(
      Some("TruncatingBuffer.DroppedMessages"), Some(5L), Some(10L))))

  test("isTruncated predicate matches only the truncation signal") {
    val spark2 = spark
    import spark2.implicits._
    val cases = Seq(
      truncation -> true,
      // wrong origin
      truncation.copy(origin = Some("router")) -> false,
      // wrong counter name
      truncation.copy(counterEvent =
        Some(CounterEvent(Some("other"), None, None))) -> false,
      // wrong event type (LogMessage)
      empty.copy(origin = Some("doppler"), eventType = Some(5)) -> false)
    val df = cases.map(_._1).toDS().toDF()
    val env = struct(df.columns.map(col): _*)
    val got = df.select(NozzlePipeline.isTruncatedExpr(env).as("alert"))
      .collect().map(r => r.getBoolean(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("streaming alert side-output counts truncation events (detector.go:36-102)") {
    val spark2 = spark
    import spark2.implicits._
    // stage an envelope-shaped parquet source: 3 truncations + noise
    val rows = Seq(truncation, truncation, truncation,
      truncation.copy(origin = Some("router")),
      empty.copy(origin = Some("x"), eventType = Some(5)))
    val srcDir = Files.createTempDirectory("alerts-src").toString
    rows.toDS().toDF().write.mode("overwrite").parquet(srcDir)
    val schema = rows.toDS().schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("envelope", struct(schema.fieldNames.map(col): _*))
    val stats = new Stats(0)
    val q = NozzlePipeline.startAlerts(stream,
      Files.createTempDirectory("alerts-ckpt").toString, stats)
    q.awaitTermination()
    assert(stats.slowConsumerAlert.get() === 3)
  }

  test("filter-type source option keeps only the requested class (filter.go)") {
    val src = NozzlePipeline.source(spark, "/root/testdata/sf0.001").limit(0)
    // batch equivalent over the surrogate for quick verification
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("envelope", NozzlePipeline.envelopeColumn)
    val logs = NozzlePipeline.filterType(batch, "logs")
    assert(logs.filter(col("envelope.eventType") =!= 5).count() === 0)
    assert(logs.count() === batch.filter("event_type = 'click'").count())
    val metrics = NozzlePipeline.filterType(batch, "metrics")
    assert(metrics.filter(!col("envelope.eventType").isin(6, 7, 9)).count() === 0)
    val all = NozzlePipeline.filterType(batch, "")
    assert(all.count() === batch.count())
    assert(src.schema.fieldNames.contains("ts_ns"))
  }
}
