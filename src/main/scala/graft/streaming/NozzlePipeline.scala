package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._

import graft.Functions
import graft.model.EnvelopeSchema

/** The always-on nozzle pipeline (SURVEY §3.1) as one Structured
  * Streaming query:
  *
  * {{{
  * source(file replay of the firehose surrogate)            O1/O2
  *   → envelope assembly (tagged union, exactly one payload)
  *   → observe() consume + per-type counters                O12
  *   → route(eventType → topic, templating, drop rules)     O5/O6/O7
  *   → envelope_json canonical encoding                     O8
  *   → sink: memory/console (O16) or foreachBatch with
  *     bounded retry + DLQ accounting (O9/O10)
  * }}}
  *
  * The whole pre-sink pipeline is narrow (map-only): no shuffle at any
  * scale; parallelism is the source's file-split parallelism. Counters
  * flow through `observe()` (zero extra pass — metrics are collected
  * by the running query itself) into [[Stats]] via
  * [[NozzlePipeline.Listener]], mirroring the reference's atomic
  * counter plane (stats.go:113-146).
  *
  * Delivery semantics: with checkpointing the pipeline is at-least-once
  * and never silently drops on backpressure — strictly stronger than
  * the reference, which drops when its retry buffer overflows
  * (kafka.go:269-272). The reference's `PublishFail` counter therefore
  * maps to our DLQ count (SURVEY §7.4 divergence note).
  */
object NozzlePipeline {

  /** Per-type topic routing table — the reference's `[kafka.topic]`
    * TOML block (config.go:70-80). Empty string = not configured =
    * drop with `Ignored` accounting (kafka.go:311-315). */
  case class TopicConfig(
      logMessage: String = "",
      logMessageFmt: String = "",
      valueMetric: String = "",
      counterEvent: String = "",
      containerMetric: String = "",
      containerMetricFmt: String = "",
      httpStartStop: String = "",
      httpStartStopFmt: String = "",
      error: String = "")

  /** Streaming-read schema of the events surrogate (ts is
    * TIMESTAMP(NANOS) in parquet; with nanosAsLong it reads as the
    * raw nanosecond long). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-replay streaming source over events parquet (O1/O2). One
    * file per micro-batch keeps replays deterministic in tests.
    *
    * Streaming reads need a declared schema, and the driver has
    * shipped `ts` both as TIMESTAMP(NANOS) (→ long ns via
    * `nanosAsLong`) and as plain µs timestamps across testdata
    * generations — so the schema is sniffed from a one-time static
    * footer read (driver-side metadata only, no data scan) and `ts`
    * is normalized to the `ts_ns` long every stage downstream keys
    * on (the Tables.events contract). */
  def source(spark: SparkSession, dir: String): DataFrame = {
    // A testdata dir holds EVERY table's parquet — sniff events.parquet
    // specifically there; a staged replay dir holds only event files.
    val sniffed =
      try {
        val ev = new java.io.File(dir, "events.parquet")
        val s = spark.read.parquet(
          if (ev.exists()) ev.getPath else dir).schema
        if (s.fieldNames.contains("ts")) s else eventsSchema
      } catch { case _: Throwable => eventsSchema } // empty dir: replay layout
    val raw = spark.readStream
      .schema(sniffed)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    sniffed("ts").dataType match {
      case LongType => raw.withColumnRenamed("ts", "ts_ns")
      case _ => raw.withColumn("ts_ns",
        expr("unix_micros(cast(ts as timestamp)) * 1000L")).drop("ts")
    }
  }

  private def nullOf(t: DataType): Column = lit(null).cast(t)

  /** Surrogate-to-Envelope assembly: the five surrogate event types
    * map onto five envelope payload types; anything else becomes the
    * unknown fixture (eventType -1, no payload, helper_test.go:101).
    * Exactly one payload is non-null — the tagged-union invariant. */
  def envelopeColumn: Column = {
    val et = col("event_type")
    val lm = struct(
      col("props").cast(BinaryType).as("message"),
      lit(1).as("message_type"),
      col("ts_ns").as("timestamp"),
      concat(lit("app-"), col("user_id")).as("app_id"),
      lit("DEA").as("source_type"),
      nullOf(StringType).as("source_instance"))
    val vm = struct(
      et.as("name"), col("value").as("value"), lit("ms").as("unit"))
    val ce = struct(
      et.as("name"), col("user_id").as("delta"), col("event_id").as("total"))
    val hss = struct(
      col("ts_ns").as("startTimestamp"),
      nullOf(LongType).as("stopTimestamp"),
      nullOf(EnvelopeSchema.uuid).as("requestId"),
      nullOf(IntegerType).as("peerType"),
      nullOf(IntegerType).as("method"),
      nullOf(StringType).as("uri"),
      nullOf(StringType).as("remoteAddress"),
      nullOf(StringType).as("userAgent"),
      nullOf(IntegerType).as("statusCode"),
      nullOf(LongType).as("contentLength"),
      struct(col("user_id").as("low"), col("event_id").as("high")).as("applicationId"),
      nullOf(IntegerType).as("instanceIndex"),
      nullOf(StringType).as("instanceId"),
      nullOf(ArrayType(StringType)).as("forwarded"))
    val err = struct(
      et.as("source"), lit(1).cast(IntegerType).as("code"),
      col("props").as("message"))
    struct(
      concat(lit("ev-"), et).as("origin"),
      when(et === "click", 5).when(et === "view", 6).when(et === "signup", 7)
        .when(et === "purchase", 4).when(et === "error", 8)
        .otherwise(-1).as("eventType"),
      col("ts_ns").as("timestamp"),
      nullOf(StringType).as("deployment"),
      nullOf(StringType).as("job"),
      nullOf(StringType).as("index"),
      nullOf(StringType).as("ip"),
      nullOf(MapType(StringType, StringType)).as("tags"),
      when(et === "purchase", hss).otherwise(nullOf(EnvelopeSchema.httpStartStop)).as("httpStartStop"),
      when(et === "click", lm).otherwise(nullOf(EnvelopeSchema.logMessage)).as("logMessage"),
      when(et === "view", vm).otherwise(nullOf(EnvelopeSchema.valueMetric)).as("valueMetric"),
      when(et === "signup", ce).otherwise(nullOf(EnvelopeSchema.counterEvent)).as("counterEvent"),
      when(et === "error", err).otherwise(nullOf(EnvelopeSchema.error)).as("error"),
      nullOf(EnvelopeSchema.containerMetric).as("containerMetric"))
  }

  /** Slow-consumer detector predicate (O4) — go-nozzle
    * detector.go:116-124 `isTruncated`: a CounterEvent named
    * TruncatingBuffer.DroppedMessages from origin "doppler" means the
    * firehose dropped messages because we read too slowly. */
  def isTruncatedExpr(env: Column): Column =
    env.getField("eventType") === 7 &&
      env.getField("counterEvent").getField("name") === "TruncatingBuffer.DroppedMessages" &&
      env.getField("origin") === "doppler"

  /** Alert side-output (detector.go:36-102): a second lightweight query
    * over the same source that filters the truncation signal and folds
    * the count into `slow_consumer_alert`. The main pipeline is
    * untouched — same pass-through shape as the reference detector. */
  def startAlerts(envDf: DataFrame, checkpoint: String, stats: Stats): StreamingQuery =
    envDf.filter(isTruncatedExpr(col("envelope")))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        stats.slowConsumerAlert.addAndGet(batch.count())
        ()
      }
      .start()

  /** Source-side event-class filter (O3) — the noaa `filter-type`
    * query param (filter.go:3-20): "logs" keeps LogMessage only,
    * "metrics" keeps ValueMetric/CounterEvent/ContainerMetric, any
    * other value keeps everything. Applied directly above the source
    * so Catalyst can push the predicate into the scan. */
  def filterType(envDf: DataFrame, kind: String): DataFrame = kind match {
    case "logs" => envDf.filter(col("envelope").getField("eventType") === 5)
    case "metrics" =>
      envDf.filter(col("envelope").getField("eventType").isin(6, 7, 9))
    case _ => envDf
  }

  /** fmtTopic (kafka.go:183-188): template wins over fixed name;
    * neither configured → NULL → drop. The reference always applies
    * fmt.Sprintf — an absent proto app id formats as "" (Go nil-proto
    * accessors return the zero value), yielding a topic like "log-"
    * that IS forwarded; NULL is coalesced to "" to match (Spark's
    * format_string would otherwise print a literal "null"). */
  private def fmtTopic(fixed: String, fmt: String, appId: Column): Column =
    if (fmt.nonEmpty) format_string(fmt, coalesce(appId, lit("")))
    else if (fixed.nonEmpty) lit(fixed)
    else nullOf(StringType)

  /** The 6-way type router (kafka.go:305-340) over an envelope
    * column. HttpStartStop's per-app template uses uuid_str of the
    * applicationId words (kafka.go:312). */
  def routeExpr(cfg: TopicConfig, env: Column): Column = {
    val et = env.getField("eventType")
    when(et === 5, fmtTopic(cfg.logMessage, cfg.logMessageFmt,
        env.getField("logMessage").getField("app_id")))
      .when(et === 6, fmtTopic(cfg.valueMetric, "", lit(null)))
      .when(et === 7, fmtTopic(cfg.counterEvent, "", lit(null)))
      .when(et === 9, fmtTopic(cfg.containerMetric, cfg.containerMetricFmt,
        env.getField("containerMetric").getField("applicationId")))
      .when(et === 4, fmtTopic(cfg.httpStartStop, cfg.httpStartStopFmt,
        Functions.uuid_str(
          env.getField("httpStartStop").getField("applicationId").getField("low"),
          env.getField("httpStartStop").getField("applicationId").getField("high"))))
      .when(et === 8, fmtTopic(cfg.error, "", lit(null)))
      .otherwise(nullOf(StringType))
  }

  /** Attach the envelope column (shared by build/alerts/filterType). */
  def withEnvelope(src: DataFrame): DataFrame =
    src.withColumn("envelope", envelopeColumn)

  /** Full pipeline: envelope → observed counters → route → encode.
    * Output: event_id, eventType, topic, payload (canonical JSON). */
  def build(src: DataFrame, cfg: TopicConfig): DataFrame = {
    val env = withEnvelope(src)
    val routed = env
      .withColumn("topic", routeExpr(cfg, col("envelope")))
      .withColumn("eventType", col("envelope").getField("eventType"))
    routed
      .observe("nozzle",
        count(lit(1)).as("consume"),
        count(when(col("eventType") === 4, 1)).as("consume_http_start_stop"),
        count(when(col("eventType") === 6, 1)).as("consume_value_metric"),
        count(when(col("eventType") === 7, 1)).as("consume_counter_event"),
        count(when(col("eventType") === 5, 1)).as("consume_log_message"),
        count(when(col("eventType") === 8, 1)).as("consume_error"),
        count(when(col("eventType") === 9, 1)).as("consume_container_metric"),
        count(when(col("eventType") === -1, 1)).as("consume_unknown"),
        // kafka.go:333-336: the topic=="" check runs AFTER the type
        // switch's default, so unknown-type events count as BOTH
        // ConsumeUnknown and Ignored (asserted by kafka_test.go:290).
        count(when(col("topic").isNull, 1)).as("ignored"),
        count(when(col("topic").isNotNull, 1)).as("forwarded"))
      .filter(col("topic").isNotNull)
      .select(col("event_id"), col("eventType"), col("topic"),
        Functions.envelope_json(col("envelope")).as("payload"))
  }

  /** O13, event-time streaming form: 1-second tumbling windows over
    * the envelope timestamp with a watermark bounding window state.
    * The reference's per-second rates are processing-time deltas
    * (stats.go:98-111, mirrored by [[Stats.tick]]); this is the
    * event-time variant the batch q08/q12 queries validate. State is
    * watermark-bounded — safe on an unbounded stream. */
  def perSecondWindows(src: DataFrame, watermark: String = "10 seconds"): DataFrame =
    src.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("per_sec"))
      .select(col("window.start").as("w"), col("per_sec"))

  /** Streaming per-user session windows (the q33 batch analogue):
    * sessions close when the watermark passes their gap-extended end,
    * so state is bounded by (active users × open sessions) — never
    * the stream. The 30-minute gap matches the batch gaps-and-islands
    * oracle exactly once sessions are closed. */
  def sessionWindows(src: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 seconds"): DataFrame =
    src.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming exact dedup with watermark-bounded state (the LLM-
    * pipeline dedup operator in its streaming form): duplicate
    * event_ids arriving within the watermark are dropped; state for
    * ids older than the watermark is evicted — bounded memory on an
    * unbounded stream (RocksDB state store at cluster scale). */
  def dedupStream(src: DataFrame, watermark: String = "10 seconds"): DataFrame =
    src.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running state — the custom-state streaming primitive
    * (`KeyValueGroupedDataset.mapGroupsWithState`): for each user, a
    * running event count and value sum maintained across micro-batches
    * in the state store (RocksDB at cluster scale), emitted per batch
    * in Update mode. The reference's only state is global counters;
    * this is the keyed generalization a training-data pipeline needs
    * (e.g. per-source quotas, per-user rate accounting). */
  case class UserState(events: Long, valueSum: Double)

  def userRunningTotals(src: DataFrame): Dataset[(Long, Long, Double)] = {
    import src.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    src.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.events
          var s = prev.valueSum
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update(UserState(n, s))
          (userId, n, s)
      }
  }

  /** Debug/console sink (O16; reference producer.go:51-63). */
  def startConsole(routed: DataFrame, checkpoint: String): StreamingQuery =
    routed.writeStream
      .format("console")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Memory sink for tests/stats queries (O15 surrogate). */
  def startMemory(routed: DataFrame, name: String, checkpoint: String): StreamingQuery =
    routed.writeStream
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Pluggable sink target (the `NozzleProducer` seam, producer.go:14-26).
    * Implementations must be serializable — publish runs on executors. */
  trait Publisher extends Serializable {
    /** Deliver one (topic, payload); throw to signal failure. */
    def publish(topic: String, payload: String): Unit
  }

  /** Kafka-sink fault handling (O9/O10): per record, bounded retry up
    * to `repartitionMax` (kafka.go:230-275, default 5); exhausted
    * records land in the DLQ path with `publish_fail` accounting
    * instead of being silently dropped. */
  def startDlq(
      routed: DataFrame,
      checkpoint: String,
      publisher: Publisher,
      repartitionMax: Int,
      stats: Stats,
      dlqPath: String): StreamingQuery = {
    routed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val attempts = batch.select("event_id", "topic", "payload")
          .as[(Long, String, String)]
          .mapPartitions { it =>
            it.map { case (id, topic, payload) =>
              var attempt = 0
              var ok = false
              while (!ok && attempt <= repartitionMax) {
                try { publisher.publish(topic, payload); ok = true }
                catch { case _: Exception => attempt += 1 }
              }
              (id, topic, payload, ok)
            }
          }
          .toDF("event_id", "topic", "payload", "ok")
          .cache()
        try {
          val okN = attempts.filter(col("ok")).count()
          val failed = attempts.filter(!col("ok"))
          val failN = failed.count()
          if (failN > 0)
            failed.drop("ok").write.mode("append").parquet(dlqPath)
          stats.publish.addAndGet(okN)
          stats.publishFail.addAndGet(failN)
          ()
        } finally attempts.unpersist()
        ()
      }
      .start()
  }

  /** Streaming counter listener (O12/O13/O17): folds each progress
    * event's observed metrics into [[Stats]] and ticks the per-second
    * rates — the reference's display/ticker goroutines
    * (cli.go:241-262, stats.go:98-111). */
  final class Listener(stats: Stats) extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics
      if (m.containsKey("nozzle")) {
        val row = m.get("nozzle")
        def g(name: String): Long = row.getAs[Long](name)
        stats.consume.addAndGet(g("consume"))
        stats.consumeHttpStartStop.addAndGet(g("consume_http_start_stop"))
        stats.consumeValueMetric.addAndGet(g("consume_value_metric"))
        stats.consumeCounterEvent.addAndGet(g("consume_counter_event"))
        stats.consumeLogMessage.addAndGet(g("consume_log_message"))
        stats.consumeError.addAndGet(g("consume_error"))
        stats.consumeContainerMetric.addAndGet(g("consume_container_metric"))
        stats.consumeUnknown.addAndGet(g("consume_unknown"))
        stats.ignored.addAndGet(g("ignored"))
        stats.forwarded.addAndGet(g("forwarded"))
        stats.tick()
      }
    }
  }
}
