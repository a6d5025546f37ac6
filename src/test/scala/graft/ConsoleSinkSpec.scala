package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NozzlePipeline
import graft.streaming.NozzlePipeline.TopicConfig

/** O16 debug/console sink smoke test — the analog of the reference's
  * LogProducer test (producer_test.go:18-48): feed an envelope through
  * the pipeline, produce to the console sink, and assert the emitted
  * text contains the routed message. The reference captures its
  * logger's buffer; here the console sink prints on the stream
  * execution thread, which inherits `Console.withOut`'s redirection
  * because `start()` spawns it inside the scope. */
class ConsoleSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val cfg = TopicConfig(
    logMessageFmt = "log-%s",
    valueMetric = "metric-topic",
    counterEvent = "counter-topic",
    httpStartStop = "http-topic",
    error = "")

  test("console sink emits routed topic/payload text (producer_test.go:18-48)") {
    val srcDir = Files.createTempDirectory("console-src").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$srcDir/part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("console-ckpt").toString

    val routed = NozzlePipeline.build(NozzlePipeline.source(spark, srcDir), cfg)
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    Console.withOut(ps) {
      val q = NozzlePipeline.startConsole(routed, ckpt)
      q.awaitTermination()
    }
    ps.flush()
    val out = buf.toString("UTF-8")
    assert(out.contains("Batch:"), s"no console batch header in: ${out.take(200)}")
    // the reference asserts its buffer contains "logMessage"; ours
    // must contain the templated log topic and the value-metric topic
    assert(out.contains("log-app-"), "no templated log topic in console output")
    assert(out.contains("metric-topic"), "no value-metric topic in console output")
  }
}
