package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types.LongType

/** Per-user running profile on Spark 4's arbitrary-state API
  * (`transformWithState` / `StatefulProcessor`) — the modern
  * replacement for the `mapGroupsWithState` form NozzlePipeline uses
  * for its per-user counters, with individually-evolvable state
  * variables instead of one opaque case-class blob.
  *
  * Semantics mirror the reference's per-app running counters (the
  * stats plane counts events per origin forever, stats.go:64-95):
  * for every user, a running event count, an exact cents sum (the
  * double `value` is scaled to integer cents BEFORE entering state —
  * no float accumulation drift across batches), and a per-type count
  * map. Because every update is an integer add, the cross-batch
  * fixpoint is bit-identical to the batch aggregate whatever the
  * micro-batch boundaries — the invariant `TransformWithStateSpec`
  * pins.
  *
  * State layout (scale posture): one `ValueState[(Long, Long)]`
  * (16 bytes) plus a `MapState[String, Long]` keyed by the small
  * event-type dictionary — per-user state is O(|types|), the state
  * store partitions by user hash exactly like the shuffle that feeds
  * it, and TTL is left to the caller's retention policy (TTLConfig
  * is plumbed through so an idle-user expiry is a one-line change).
  * Requires the RocksDB state-store provider (transformWithState's
  * backing store in Spark 4).
  */
object UserProfile {

  case class In(user_id: Long, event_type: String, cents: Long)
  case class Out(user_id: Long, n: Long, cents: Long, purchases: Long)

  class Processor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, In, Out] {
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)
      byType = getHandle.getMapState[String, Long](
        "byType", Encoders.STRING, Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { e =>
        n += 1
        cents += e.cents
        val prev = if (byType.containsKey(e.event_type)) byType.getValue(e.event_type) else 0L
        byType.updateValue(e.event_type, prev + 1)
      }
      totals.update((n, cents))
      val purchases = if (byType.containsKey("purchase")) byType.getValue("purchase") else 0L
      Iterator.single(Out(key, n, cents, purchases))
    }
  }

  /** The streaming profile over an events stream (any source with
    * `user_id`, `event_type`, `value`). Update-mode output: one row
    * per touched user per micro-batch carrying the running totals. */
  def profiles(events: Dataset[org.apache.spark.sql.Row]): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType).as("user_id"),
        col("event_type"),
        // exact integer cents: scale BEFORE state, one double op per
        // row (bit-identical in any engine), never a float running sum
        (col("value") * 100).cast(LongType).as("cents"))
      .as[In]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(), TimeMode.None(), OutputMode.Update())
  }
}
