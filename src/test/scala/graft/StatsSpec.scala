package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stats

/** Golden snapshot parity with the reference stats plane
  * (stats_test.go:11-121). */
class StatsSpec extends AnyFunSuite {

  test("golden: snapshot JSON matches stats_test.go:64-84 byte-exactly") {
    val s = new Stats(0)
    (1 to 100).foreach(_ => s.consume.incrementAndGet())
    (1 to 50).foreach(_ => s.publishFail.incrementAndGet())
    (1 to 50).foreach(_ => s.publish.incrementAndGet())
    (1 to 100).foreach(_ => s.subInputBuffer.incrementAndGet())
    (1 to 50).foreach(_ => s.subInputBuffer.decrementAndGet())
    (1 to 100).foreach(_ => s.forwarded.incrementAndGet())
    val expect =
      """{
        |  "consume": 100,
        |  "consume_per_sec": 0,
        |  "consume_fail": 0,
        |  "consume_http_start_stop": 0,
        |  "consume_value_metric": 0,
        |  "consume_counter_event": 0,
        |  "consume_log_message": 0,
        |  "consume_error": 0,
        |  "consume_container_metric": 0,
        |  "consume_unknown": 0,
        |  "ignored": 0,
        |  "forwarded": 100,
        |  "publish": 50,
        |  "publish_per_sec": 0,
        |  "publish_fail": 50,
        |  "slow_consumer_alert": 0,
        |  "subinupt_buffer": 50,
        |  "delay": 0,
        |  "instance_id": 0
        |}""".stripMargin
    assert(s.prettyJson() === expect)
  }

  test("delay wraps unsigned like Go uint64 (stats.go:94)") {
    val s = new Stats(0)
    s.publish.addAndGet(3) // forwarded=0, publish=3 -> delay wraps
    assert(s.json().contains("\"delay\":18446744073709551613"))
  }

  test("per-second rates are deltas between ticks (stats.go:98-111)") {
    val s = new Stats(0)
    s.consume.addAndGet(10); s.publish.addAndGet(4)
    s.tick()
    assert(s.consumePerSec === 10 && s.publishPerSec === 4)
    s.consume.addAndGet(7)
    s.tick()
    assert(s.consumePerSec === 7 && s.publishPerSec === 0)
  }

  test("instance id from CF_INSTANCE_INDEX env (stats_test.go:103-121)") {
    assert(Stats.instanceIdFromEnv(Map("CF_INSTANCE_INDEX" -> "4")) === 4)
    assert(Stats.instanceIdFromEnv(Map("CF_INSTANCE_INDEX" -> "xx")) === 0)
    assert(Stats.instanceIdFromEnv(Map.empty) === 0)
  }
}
