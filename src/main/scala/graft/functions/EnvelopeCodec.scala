package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.EnvelopeSchema

/** Decode side of the canonical JSON contract (O2 — the reference's
  * protobuf deserialize step, async.go:274-280, with its
  * silently-skip-malformed policy).
  *
  * `from_json` parses the canonical form against a wire-shape schema:
  * `logMessage.message` is the base64 STRING the wire carries, and
  * every proto uint64 field (UUID words, counter delta/total,
  * container byte gauges) is read as DECIMAL(20,0) — the encoder
  * prints them as unsigned decimals, which can exceed Long.MaxValue —
  * then converted back to the two's-complement signed long the
  * Envelope model stores. Malformed records yield NULL; the
  * DROPMALFORMED policy is a `filter(isNotNull)`, mirroring the
  * reference's `continue` on unmarshal error.
  *
  * Round-trip law (tested): `decode(envelope_json(e)) == e` for every
  * envelope whose maps/arrays are in canonical order.
  */
object EnvelopeCodec {

  private val u64Max = BigDecimal("18446744073709551616") // 2^64
  private val i64Max = BigDecimal("9223372036854775807") // 2^63-1

  /** uint64 JSON fields on the wire, as struct-path strings. */
  private val u64Fields = Seq(
    "httpStartStop.requestId.low", "httpStartStop.requestId.high",
    "httpStartStop.applicationId.low", "httpStartStop.applicationId.high",
    "counterEvent.delta", "counterEvent.total",
    "containerMetric.memoryBytes", "containerMetric.diskBytes",
    "containerMetric.memoryBytesQuota", "containerMetric.diskBytesQuota")

  /** Envelope schema as it appears on the wire, plus a corrupt-record
    * capture column: from_json is PERMISSIVE (malformed input yields
    * an all-null struct, not NULL), so malformed detection rides on
    * the corrupt column being populated. */
  private val corruptCol = "_graft_corrupt"
  private val wireSchema: StructType = {
    def rewrite(dt: DataType, path: List[String]): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val p = (f.name :: path).reverse.mkString(".")
        if (p == "logMessage.message") f.copy(dataType = StringType)
        else if (u64Fields.contains(p)) f.copy(dataType = DecimalType(20, 0))
        else f.copy(dataType = rewrite(f.dataType, f.name :: path))
      })
      case other => other
    }
    rewrite(EnvelopeSchema.schema, Nil).asInstanceOf[StructType]
      .add(corruptCol, StringType)
  }

  /** Unsigned decimal → two's-complement signed long. */
  private def signed(c: Column): Column =
    when(c > lit(i64Max), (c - lit(u64Max)).cast(LongType))
      .otherwise(c.cast(LongType))

  /** Parse canonical Envelope JSON; malformed input → NULL.
    *
    * The model struct is rebuilt in ONE explicit pass (a chain of
    * nested `withField`s re-wraps the whole prior expression per
    * field and blows up the analysis tree exponentially). */
  def decode(json: Column): Column = {
    val p = from_json(json, wireSchema,
      Map("columnNameOfCorruptRecord" -> corruptCol))

    def nullable(sub: Column, t: DataType)(build: => Column): Column =
      when(sub.isNull, lit(null).cast(t)).otherwise(build)

    val uuid = (u: Column) => nullable(u, EnvelopeSchema.uuid)(struct(
      signed(u.getField("low")).as("low"),
      signed(u.getField("high")).as("high")))

    val hss = p.getField("httpStartStop")
    val lm = p.getField("logMessage")
    val ce = p.getField("counterEvent")
    val cm = p.getField("containerMetric")

    val env = struct(
      p.getField("origin").as("origin"),
      p.getField("eventType").as("eventType"),
      p.getField("timestamp").as("timestamp"),
      p.getField("deployment").as("deployment"),
      p.getField("job").as("job"),
      p.getField("index").as("index"),
      p.getField("ip").as("ip"),
      p.getField("tags").as("tags"),
      nullable(hss, EnvelopeSchema.httpStartStop)(struct(
        hss.getField("startTimestamp").as("startTimestamp"),
        hss.getField("stopTimestamp").as("stopTimestamp"),
        uuid(hss.getField("requestId")).as("requestId"),
        hss.getField("peerType").as("peerType"),
        hss.getField("method").as("method"),
        hss.getField("uri").as("uri"),
        hss.getField("remoteAddress").as("remoteAddress"),
        hss.getField("userAgent").as("userAgent"),
        hss.getField("statusCode").as("statusCode"),
        hss.getField("contentLength").as("contentLength"),
        uuid(hss.getField("applicationId")).as("applicationId"),
        hss.getField("instanceIndex").as("instanceIndex"),
        hss.getField("instanceId").as("instanceId"),
        hss.getField("forwarded").as("forwarded"))).as("httpStartStop"),
      nullable(lm, EnvelopeSchema.logMessage)(struct(
        unbase64(lm.getField("message")).as("message"),
        lm.getField("message_type").as("message_type"),
        lm.getField("timestamp").as("timestamp"),
        lm.getField("app_id").as("app_id"),
        lm.getField("source_type").as("source_type"),
        lm.getField("source_instance").as("source_instance"))).as("logMessage"),
      p.getField("valueMetric").as("valueMetric"),
      nullable(ce, EnvelopeSchema.counterEvent)(struct(
        ce.getField("name").as("name"),
        signed(ce.getField("delta")).as("delta"),
        signed(ce.getField("total")).as("total"))).as("counterEvent"),
      p.getField("error").as("error"),
      nullable(cm, EnvelopeSchema.containerMetric)(struct(
        cm.getField("applicationId").as("applicationId"),
        cm.getField("instanceIndex").as("instanceIndex"),
        cm.getField("cpuPercentage").as("cpuPercentage"),
        signed(cm.getField("memoryBytes")).as("memoryBytes"),
        signed(cm.getField("diskBytes")).as("diskBytes"),
        signed(cm.getField("memoryBytesQuota")).as("memoryBytesQuota"),
        signed(cm.getField("diskBytesQuota")).as("diskBytesQuota"))).as("containerMetric"))

    // malformed input → NULL envelope (DROPMALFORMED on filter)
    when(p.isNull || p.getField(corruptCol).isNotNull,
      lit(null).cast(EnvelopeSchema.schema)).otherwise(env)
  }
}
