package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.config.KafkaConfig

/** Source-connector control plane: auth token lifecycle (O18),
  * reconnect backoff policy (O19), and the Kafka sink configuration
  * mapping (O9). These are the driver-side pieces a custom streaming
  * source/sink uses; the policies are pure and fully tested, the
  * network edges are seams.
  */
object Connector {

  // -- O18: token fetch/refresh (go-nozzle token.go:37-89) ------------

  /** The UAA-client seam: a real deployment performs the OAuth POST
    * here. Kept abstract so the lifecycle logic is testable. */
  trait TokenSource extends Serializable {
    /** Return a fresh token or throw. */
    def fetch(): String
  }

  /** Token lifecycle: validate config, fetch with timeout, re-fetch on
    * expiry (`refresh()` — the noaa TokenRefresher hook,
    * async.go:372-406). */
  final class TokenFetcher(
      uaaAddr: String, username: String, password: String,
      source: TokenSource, timeoutMs: Long = 20000) {

    /** Reference validate(): all three fields required (token.go:68-82). */
    def validate(): Either[String, Unit] =
      if (uaaAddr.isEmpty) Left("UaaAddr must not be empty")
      else if (username.isEmpty) Left("Username must not be empty")
      else if (password.isEmpty) Left("Password must not be empty")
      else Right(())

    private val cached = new AtomicReference[String](null)

    /** Fetch with timeout (token.go:44-66). */
    def fetch(): Either[String, String] = validate().flatMap { _ =>
      val result = new java.util.concurrent.SynchronousQueue[Either[String, String]]()
      val t = new Thread(() => {
        val r = try Right(source.fetch())
        catch { case e: Exception => Left(e.getMessage) }
        result.offer(r, timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        ()
      }, "graft-token-fetch")
      t.setDaemon(true)
      t.start()
      Option(result.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
        .getOrElse(Left(s"request timeout: ${timeoutMs}ms"))
        .map { tok => cached.set(tok); tok }
    }

    /** The refresh hook: always re-fetches (token.go:87-89). */
    def refresh(): Either[String, String] = fetch()

    def current: Option[String] = Option(cached.get())
  }

  // -- O19: reconnect backoff (noaa async.go:20-24, 298-351) ----------

  /** Exponential reconnect policy: delay doubles from `minDelayMs` up
    * to `maxDelayMs`, resets on successful connect, gives up after
    * `maxRetries` consecutive failures. Pure state machine. */
  final class Backoff(
      minDelayMs: Long = 500, // DefaultMinRetryDelay
      maxDelayMs: Long = 60000, // DefaultMaxRetryDelay
      maxRetries: Long = 1000) { // DefaultMaxRetryCount

    private var sleep = minDelayMs
    private var count = 0L

    /** Delay to apply before the next attempt, or None when the retry
      * budget is exhausted (ErrMaxRetriesReached). */
    def nextDelayMs(): Option[Long] = synchronized {
      if (count >= maxRetries) None
      else {
        count += 1
        val d = sleep
        sleep = math.min(sleep * 2, maxDelayMs)
        Some(d)
      }
    }

    /** Successful connect resets delay and budget (async.go:311-317). */
    def onConnected(): Unit = synchronized { sleep = minDelayMs; count = 0 }

    def retriesUsed: Long = synchronized(count)
  }

  // -- O9: Kafka sink configuration (kafka.go:70-101) -----------------

  /** Map the engine config onto Spark Kafka-sink options. Mirrors the
    * reference's producer config: acks=all, bounded retry + backoff,
    * gzip/snappy/none compression (unknown codec is an error), TLS
    * switches. Round-robin partitioning is the Kafka default when no
    * key column is set — we set none, matching kafka.go:70-72. */
  def kafkaSinkOptions(cfg: KafkaConfig,
      insecureSkipVerify: Boolean = false): Either[String, Map[String, String]] = {
    val compression = cfg.compression match {
      case "gzip" => Right(Some("gzip"))
      case "snappy" => Right(Some("snappy"))
      case "none" | "" => Right(None)
      case other => Left(s"unknown compression codec: $other")
    }
    for {
      comp <- compression
      tls <- tlsOptions(cfg, insecureSkipVerify)
    } yield Map(
      "kafka.bootstrap.servers" -> cfg.brokers.mkString(","),
      "kafka.acks" -> "all", // sarama.WaitForAll
      "kafka.retries" ->
        (if (cfg.retryMax != 0) cfg.retryMax else 1).toString, // DefaultKafkaRetryMax
      "kafka.retry.backoff.ms" ->
        (if (cfg.retryBackoffMs != 0) cfg.retryBackoffMs else 100).toString) ++
      comp.map("kafka.compression.type" -> _) ++ tls
  }

  /** TLS client-cert material → Kafka PEM options (kafka.go:33-68).
    * Validation order and error strings follow the reference: client
    * cert required, then client key, then the CA PEM must contain at
    * least one CERTIFICATE block ("no certs in ca pem") and the key a
    * PEM block (tls.X509KeyPair's "failed to find any PEM data").
    * No CA certs configured → the JVM default truststore, the
    * x509.SystemCertPool() analogue. A mismatched-but-well-formed
    * key/cert pair maps through and fails at the handshake, exactly
    * where sarama surfaces it (tls_test.go wrong-key case).
    * `insecure_ssl_skip_verify` disables hostname verification
    * (`ssl.endpoint.identification.algorithm=""`) — the closest JVM
    * analogue of Go's InsecureSkipVerify; chain verification itself
    * cannot be disabled by the Java client (documented divergence). */
  private def tlsOptions(cfg: KafkaConfig,
      insecureSkipVerify: Boolean): Either[String, Map[String, String]] = {
    if (!cfg.enableTLS) Right(Map.empty)
    else if (cfg.clientCert.isEmpty) Left("please specify client_certificate")
    else if (cfg.clientKey.isEmpty) Left("please specify private_key")
    else if (cfg.caCerts.nonEmpty &&
        !cfg.caCerts.forall(_.contains("-----BEGIN CERTIFICATE-----")))
      Left("no certs in ca pem")
    else if (!cfg.clientCert.contains("-----BEGIN CERTIFICATE-----") ||
        !cfg.clientKey.contains("-----BEGIN"))
      Left("failed to find any PEM data in key input")
    else Right(
      Map(
        "kafka.security.protocol" -> "SSL",
        "kafka.ssl.keystore.type" -> "PEM",
        "kafka.ssl.keystore.key" -> cfg.clientKey,
        "kafka.ssl.keystore.certificate.chain" -> cfg.clientCert) ++
        (if (cfg.caCerts.nonEmpty)
          Map(
            "kafka.ssl.truststore.type" -> "PEM",
            "kafka.ssl.truststore.certificates" -> cfg.caCerts.mkString("\n"))
        else Map.empty) ++
        (if (insecureSkipVerify)
          Map("kafka.ssl.endpoint.identification.algorithm" -> "")
        else Map.empty))
  }

  /** Configured (not started) Kafka writer for a routed stream: the
    * `topic` column selects the destination per record and `value` is
    * the canonical JSON payload. Start it where a broker exists. */
  def kafkaWriter(routed: DataFrame, cfg: KafkaConfig,
      checkpoint: String,
      insecureSkipVerify: Boolean = false): Either[String, DataStreamWriter[Row]] =
    kafkaSinkOptions(cfg, insecureSkipVerify).map { opts =>
      routed
        .selectExpr("topic", "payload AS value")
        .writeStream
        .format("kafka")
        .options(opts)
        .option("checkpointLocation", checkpoint)
    }
}
