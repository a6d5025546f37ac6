package graft

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Stats, StatsReporter, StatsServer}

/** O15 (stats HTTP endpoint, server.go:31-85) and O17 (periodic
  * reporter, cli.go:241-262). */
class StatsServerSpec extends AnyFunSuite {

  private def get(url: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("GET /stats/app serves the live snapshot") {
    val stats = new Stats(3)
    stats.consume.addAndGet(7)
    stats.forwarded.addAndGet(5)
    val server = new StatsServer(stats, 0).start()
    try {
      val (code, body) = get(s"http://127.0.0.1:${server.boundPort}/stats/app")
      assert(code === 200)
      assert(body === stats.json())
      assert(body.contains("\"consume\":7"))
      assert(body.contains("\"instance_id\":3"))
      // snapshot is live: counters move between requests
      stats.consume.addAndGet(1)
      val (_, body2) = get(s"http://127.0.0.1:${server.boundPort}/stats/app")
      assert(body2.contains("\"consume\":8"))
    } finally server.stop()
  }

  test("GET /stats/runtime serves JVM runtime counters") {
    val server = new StatsServer(new Stats(0), 0).start()
    try {
      val (code, body) = get(s"http://127.0.0.1:${server.boundPort}/stats/runtime")
      assert(code === 200)
      assert(body.contains("\"heap_alloc\":") && body.contains("\"cpu_num\":"))
      assert(body.contains(s""""version":"${BuildInfo.Version}""""),
        s"build version missing from /stats/runtime: $body")
    } finally server.stop()
  }

  test("GET /debug/jvm serves the pprof-analogue profile (server.go:33-38)") {
    val server = new StatsServer(new Stats(0), 0).start()
    try {
      val (code, body) = get(s"http://127.0.0.1:${server.boundPort}/debug/jvm")
      assert(code === 200)
      assert(body.contains("heap_used "))
      assert(body.contains("gc "))
      // a thread dump with stack frames, including this test's thread
      assert(body.contains("thread "))
      assert(body.contains("  at "))
    } finally server.stop()
  }

  test("reporter emits the reference's counter lines (cli.go:243-261)") {
    val stats = new Stats(0)
    stats.consume.addAndGet(10)
    stats.publish.addAndGet(4)
    stats.publishFail.addAndGet(1)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    new StatsReporter(stats, 60000, lines += _).report()
    assert(lines.size === 9)
    assert(lines.contains("Consumed messages: 10"))
    assert(lines.contains("Published messages: 4"))
    assert(lines.contains("Publish delay: 5")) // consume - publish - publish_fail
    assert(lines.contains("SlowConsumer alerts: 0"))
  }
}
