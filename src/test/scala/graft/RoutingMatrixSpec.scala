package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UuidStr
import graft.model._
import graft.streaming.NozzlePipeline
import graft.streaming.NozzlePipeline.TopicConfig

/** The reference's routing matrix (kafka_test.go:16-228) and
  * no-forward semantics (kafka_test.go:230-312) over real Envelope
  * rows: every event type to its configured topic, template topics
  * expanding with the app id (uuid_str for HttpStartStop), empty
  * config dropping with Ignored accounting, unknown types dropped. */
class RoutingMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val testAppId = "3356a5c7-e86c-442a-b14f-ce5cc4f80ed1"

  private def empty = Envelope(None, None, None, None, None, None, None,
    None, None, None, None, None, None, None)

  private def route(cfg: TopicConfig, envs: Seq[Envelope]): Seq[Option[String]] = {
    val spark2 = spark
    import spark2.implicits._
    val df = envs.toDS().toDF()
    val env = struct(df.columns.map(col): _*)
    df.select(NozzlePipeline.routeExpr(cfg, env).as("topic"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  private val fullCfg = TopicConfig(
    logMessage = "log", logMessageFmt = "",
    valueMetric = "metric",
    counterEvent = "counter",
    containerMetric = "container", containerMetricFmt = "",
    httpStartStop = "http", httpStartStopFmt = "",
    error = "err")

  private def allSix: Seq[Envelope] = {
    val (low, high) = UuidStr.parse(testAppId)
    Seq(
      empty.copy(eventType = Some(5), logMessage = Some(LogMessage(
        None, Some(1), None, Some(testAppId), None, None))),
      empty.copy(eventType = Some(6), valueMetric = Some(ValueMetric(Some("df"), Some(0.99), None))),
      empty.copy(eventType = Some(7), counterEvent = Some(CounterEvent(Some("c"), None, None))),
      empty.copy(eventType = Some(9), containerMetric = Some(ContainerMetric(
        Some(testAppId), Some(0), None, None, None, None, None))),
      empty.copy(eventType = Some(4), httpStartStop = Some(HttpStartStop(
        None, None, None, None, None, None, None, None, None, None,
        Some(Uuid(low, high)), None, None, None))),
      empty.copy(eventType = Some(8), error = Some(ErrorEvent(None, None, Some("boom")))))
  }

  test("fixed topics: each of the six event types routes to its topic") {
    assert(route(fullCfg, allSix) === Seq(
      Some("log"), Some("metric"), Some("counter"),
      Some("container"), Some("http"), Some("err")))
  }

  test("template topics expand with the app id (kafka.go:183-219)") {
    val cfg = fullCfg.copy(
      logMessageFmt = "log-%s",
      containerMetricFmt = "container-metric-%s",
      httpStartStopFmt = "http-%s")
    val got = route(cfg, allSix)
    assert(got(0) === Some(s"log-$testAppId"))
    assert(got(3) === Some(s"container-metric-$testAppId"))
    // HttpStartStop app id renders through uuid_str (kafka.go:312)
    assert(got(4) === Some(s"http-$testAppId"))
    // non-templated types keep their fixed topics
    assert(got(1) === Some("metric") && got(2) === Some("counter")
      && got(5) === Some("err"))
  }

  test("no-forward: unconfigured topic drops; unknown type drops") {
    val noneCfg = TopicConfig() // nothing configured
    assert(route(noneCfg, allSix).forall(_.isEmpty))
    val unknown = empty.copy(eventType = Some(-1))
    assert(route(fullCfg, Seq(unknown)) === Seq(None))
  }

  test("template with absent app id renders the Go zero value (kafka.go:183-188)") {
    // fmtTopic always applies fmt.Sprintf: a nil proto accessor
    // yields "", so the topic is "log-" and the event IS forwarded
    val cfg = TopicConfig(logMessageFmt = "log-%s")
    val noAppId = empty.copy(eventType = Some(5),
      logMessage = Some(LogMessage(None, Some(1), None, None, None, None)))
    assert(route(cfg, Seq(noAppId)) === Seq(Some("log-")))
  }
}
