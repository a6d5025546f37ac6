package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

/** Sandbox analogue of `sarama.MockBroker` (the reference's broker
  * test double, kafka_test.go:314-458): an in-process "broker" that
  * PARSES the real producer option surface and implements the
  * behaviors the reference proves against its mock — round-robin
  * spread for key-less sends, leader-failure retry with repartition
  * (kafka.go:230-275), and per-codec payload compression. No Kafka
  * jars exist in this sandbox, so the option names are validated
  * against the public Apache Kafka producer config registry below; a
  * typo'd key that the real client would ignore/reject fails here
  * too, which is exactly the gap (`a wrong option key would still
  * pass`) this closes.
  */
object FakeKafka {

  /** Public Apache Kafka producer config names (kafka.apache.org
    * producer configs) — a superset of what Connector emits, so any
    * emitted key outside it is a genuine typo. */
  val producerConfigNames: Set[String] = Set(
    "bootstrap.servers", "client.id", "acks", "retries", "retry.backoff.ms",
    "compression.type", "batch.size", "linger.ms", "buffer.memory",
    "max.request.size", "request.timeout.ms", "delivery.timeout.ms",
    "enable.idempotence", "max.in.flight.requests.per.connection",
    "security.protocol",
    "ssl.keystore.type", "ssl.keystore.key", "ssl.keystore.certificate.chain",
    "ssl.keystore.location", "ssl.keystore.password",
    "ssl.truststore.type", "ssl.truststore.certificates",
    "ssl.truststore.location", "ssl.truststore.password",
    "ssl.endpoint.identification.algorithm",
    "key.serializer", "value.serializer", "partitioner.class")

  final case class Settings(
      bootstrap: String,
      acks: String,
      retries: Int,
      backoffMs: Long,
      codec: String, // none | gzip | snappy
      ssl: Boolean)

  /** Parse a Spark Kafka-sink option map the way the real sink does:
    * `kafka.`-prefixed keys are handed to the producer config. Unknown
    * producer keys and out-of-domain values are errors. */
  def parseOptions(opts: Map[String, String]): Either[String, Settings] = {
    val producer = opts.collect {
      case (k, v) if k.startsWith("kafka.") => k.stripPrefix("kafka.") -> v
    }
    val unknown = producer.keys.filterNot(producerConfigNames).toSeq.sorted
    if (unknown.nonEmpty) return Left(s"unknown producer config(s): ${unknown.mkString(", ")}")
    val bootstrap = producer.getOrElse("bootstrap.servers", "")
    if (bootstrap.isEmpty) return Left("bootstrap.servers is required")
    val acks = producer.getOrElse("acks", "1")
    if (!Set("all", "-1", "0", "1")(acks)) return Left(s"invalid acks: $acks")
    // non-empty, digits only, and within the numeric type's range
    // ("" and overflowing values must be a Left, not a NumberFormatException)
    def posNum(s: String, max: Long): Option[Long] =
      if (s.nonEmpty && s.length <= 18 && s.forall(_.isDigit) && s.toLong <= max)
        Some(s.toLong)
      else None
    val retries = producer.getOrElse("retries", "2147483647")
    if (posNum(retries, Int.MaxValue.toLong).isEmpty)
      return Left(s"invalid retries: $retries")
    val backoff = producer.getOrElse("retry.backoff.ms", "100")
    if (posNum(backoff, Long.MaxValue).isEmpty)
      return Left(s"invalid retry.backoff.ms: $backoff")
    val codec = producer.getOrElse("compression.type", "none")
    if (!Set("none", "gzip", "snappy", "lz4", "zstd")(codec))
      return Left(s"invalid compression.type: $codec")
    val ssl = producer.get("security.protocol").contains("SSL")
    if (ssl) {
      if (producer.getOrElse("ssl.keystore.type", "") == "PEM" &&
          (producer.getOrElse("ssl.keystore.key", "").isEmpty ||
            producer.getOrElse("ssl.keystore.certificate.chain", "").isEmpty))
        return Left("PEM keystore requires ssl.keystore.key and ssl.keystore.certificate.chain")
    }
    Right(Settings(bootstrap, acks, retries.toInt, backoff.toLong, codec, ssl))
  }

  final case class Record(key: Option[String], value: Array[Byte], codec: String)

  /** Broker-side state: per-(topic, partition) logs plus injectable
    * leader failures (fail the next N appends to a partition). */
  final class Broker(val partitions: Int) {
    private val logs = mutable.Map.empty[(String, Int), mutable.Buffer[Record]]
    private val failing = mutable.Map.empty[(String, Int), Int]

    def failPartition(topic: String, partition: Int, times: Int): Unit =
      synchronized { failing((topic, partition)) = times }

    private[FakeKafka] def append(topic: String, partition: Int, rec: Record): Unit =
      synchronized {
        val left = failing.getOrElse((topic, partition), 0)
        if (left > 0) {
          failing((topic, partition)) = left - 1
          throw new IllegalStateException(
            s"NOT_LEADER_OR_FOLLOWER: $topic-$partition")
        }
        logs.getOrElseUpdate((topic, partition), mutable.Buffer.empty) += rec
      }

    def fetch(topic: String, partition: Int): Seq[Record] =
      synchronized(logs.getOrElse((topic, partition), mutable.Buffer.empty).toSeq)

    def totalRecords(topic: String): Int =
      synchronized((0 until partitions).map(p => fetch(topic, p).size).sum)
  }

  /** Producer against the fake broker: validates options at
    * construction (like KafkaProducer config validation), compresses
    * per codec, round-robins key-less sends, and on a failed append
    * re-submits to the next partition up to `retries` times — the
    * reference's repartition-on-error loop (kafka.go:230-275). */
  final class Producer private (broker: Broker, val settings: Settings) {
    private val rr = mutable.Map.empty[String, Int]

    private def compress(value: Array[Byte]): Array[Byte] = settings.codec match {
      case "gzip" =>
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(value); gz.close(); bos.toByteArray
      case "snappy" => org.xerial.snappy.Snappy.compress(value)
      case _ => value
    }

    /** Returns the partition the record finally landed on. */
    def send(topic: String, key: Option[String], value: Array[Byte]): Int = {
      val payload = compress(value)
      var part = key match {
        case Some(k) => math.floorMod(k.hashCode, broker.partitions)
        case None =>
          val p = rr.getOrElse(topic, 0)
          rr(topic) = p + 1
          p % broker.partitions
      }
      var attempt = 0
      while (true) {
        try {
          broker.append(topic, part, Record(key, payload, settings.codec))
          return part
        } catch {
          case e: IllegalStateException =>
            attempt += 1
            if (attempt > settings.retries) throw e
            // "try to resubmit the message so that it can end up on a
            // different partition (we don't care about message order)"
            part = (part + 1) % broker.partitions
        }
      }
      -1 // unreachable
    }
  }

  object Producer {
    def apply(broker: Broker, opts: Map[String, String]): Either[String, Producer] =
      parseOptions(opts).map(new Producer(broker, _))
  }

  /** The broker's network face for the TLS matrix (tls_test.go:18-248
    * analogue): an SSLServerSocket that DEMANDS a client certificate
    * (mutual TLS, like the reference's tls.RequireAndVerifyClientCert
    * deployment) and speaks a one-line produce protocol —
    * `PRODUCE <topic> <base64 value>` → `OK <partition>`. What's under
    * test is the HANDSHAKE seam (CA trust, client key possession);
    * the Kafka wire protocol itself is out of scope, as in
    * sarama.MockBroker. */
  final class TlsListener(broker: Broker, ctx: javax.net.ssl.SSLContext) {
    private val ss = ctx.getServerSocketFactory
      .createServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
      .asInstanceOf[javax.net.ssl.SSLServerSocket]
    ss.setNeedClientAuth(true)
    val port: Int = ss.getLocalPort
    @volatile private var closed = false
    private val rr = new java.util.concurrent.atomic.AtomicInteger(0)

    private val acceptor = new Thread(() => {
      try while (!closed) {
        val s = ss.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // closed
    }, s"fake-kafka-tls-$port")
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(s: java.net.Socket): Unit =
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
        val out = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
        var line = in.readLine() // triggers the TLS handshake
        while (line != null) {
          line.split(" ", 3) match {
            case Array("PRODUCE", topic, b64) =>
              val part = rr.getAndIncrement() % broker.partitions
              broker.append(topic, part,
                Record(None, java.util.Base64.getDecoder.decode(b64), "none"))
              out.write(s"OK $part\n"); out.flush()
            case _ =>
              out.write("ERR bad request\n"); out.flush()
          }
          line = in.readLine()
        }
      } catch {
        case _: Exception => () // handshake failures end the connection
      } finally s.close()

    def close(): Unit = { closed = true; ss.close() }
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
