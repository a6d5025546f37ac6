package graft.streaming

import java.util.concurrent.atomic.AtomicLong

/** The engine's streaming counter aggregate — the reference's `Stats`
  * (stats.go:40-96): 19 numeric fields updated concurrently and
  * snapshotted to JSON on demand.
  *
  * Field set, JSON key names (including the reference's misspelled
  * `subinupt_buffer`, preserved deliberately), key order, and the
  * derived `delay = forwarded - (publish + publish_fail)` all match
  * the golden snapshot (stats_test.go:64-84). Counters are unsigned
  * (uint64 in the reference) and rendered via unsigned printing.
  *
  * `instance_id` comes from the CF_INSTANCE_INDEX env var when set
  * and parseable, else 0 (stats.go:76-91).
  */
final class Stats(val instanceId: Int) {

  val consume = new AtomicLong
  val consumeFail = new AtomicLong
  val consumeHttpStartStop = new AtomicLong
  val consumeValueMetric = new AtomicLong
  val consumeCounterEvent = new AtomicLong
  val consumeLogMessage = new AtomicLong
  val consumeError = new AtomicLong
  val consumeContainerMetric = new AtomicLong
  val consumeUnknown = new AtomicLong
  val ignored = new AtomicLong
  val forwarded = new AtomicLong
  val publish = new AtomicLong
  val publishFail = new AtomicLong
  val slowConsumerAlert = new AtomicLong
  val subInputBuffer = new AtomicLong

  @volatile var consumePerSec: Long = 0
  @volatile var publishPerSec: Long = 0
  private var lastConsume: Long = 0
  private var lastPublish: Long = 0

  /** One rate tick (stats.go:98-111 runs this on a 1 s wall ticker;
    * the streaming listener calls it per progress event). */
  def tick(): Unit = synchronized {
    val c = consume.get(); val p = publish.get()
    consumePerSec = c - lastConsume
    publishPerSec = p - lastPublish
    lastConsume = c
    lastPublish = p
  }

  private def u(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** Compact JSON snapshot; key order is the reference struct order. */
  def json(): String = {
    // uint64 subtraction wraps, matching Go (stats.go:94)
    val delay = forwarded.get() - (publish.get() + publishFail.get())
    s"""{"consume":${u(consume.get())},""" +
      s""""consume_per_sec":${u(consumePerSec)},""" +
      s""""consume_fail":${u(consumeFail.get())},""" +
      s""""consume_http_start_stop":${u(consumeHttpStartStop.get())},""" +
      s""""consume_value_metric":${u(consumeValueMetric.get())},""" +
      s""""consume_counter_event":${u(consumeCounterEvent.get())},""" +
      s""""consume_log_message":${u(consumeLogMessage.get())},""" +
      s""""consume_error":${u(consumeError.get())},""" +
      s""""consume_container_metric":${u(consumeContainerMetric.get())},""" +
      s""""consume_unknown":${u(consumeUnknown.get())},""" +
      s""""ignored":${u(ignored.get())},""" +
      s""""forwarded":${u(forwarded.get())},""" +
      s""""publish":${u(publish.get())},""" +
      s""""publish_per_sec":${u(publishPerSec)},""" +
      s""""publish_fail":${u(publishFail.get())},""" +
      s""""slow_consumer_alert":${u(slowConsumerAlert.get())},""" +
      s""""subinupt_buffer":${subInputBuffer.get()},""" +
      s""""delay":${u(delay)},""" +
      s""""instance_id":$instanceId}"""
  }

  /** Two-space-indented form, byte-comparable to the reference golden
    * (stats_test.go uses json.Indent with "  "). */
  def prettyJson(): String =
    json().replace("{", "{\n  ").replace(",\"", ",\n  \"")
      .replace("}", "\n}").replaceAll("\":", "\": ")
}

object Stats {
  val EnvCFInstanceIndex = "CF_INSTANCE_INDEX"

  def apply(): Stats = new Stats(instanceIdFromEnv(sys.env))

  def instanceIdFromEnv(env: Map[String, String]): Int =
    env.get(EnvCFInstanceIndex)
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .getOrElse(0)
}
