package graft

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Connector, NozzleReader, WebSocket}

/** O1/O4/O18/O19 over the REAL wire protocol: RFC-6455 frames on a
  * loopback socket — upgrade handshake with Authorization, text AND
  * binary data frames, ping/pong, and the close-code semantics the
  * reference's detector keys on (go-nozzle detector.go:70-90): a 1008
  * close is a slow-consumer ALERT on the side channel and then a
  * normal re-dial; a 1000 close is a plain retryable disconnect.
  *
  * Server script (one thread per accepted connection):
  *   conn 0: 101 + 2 text frames + PING (pong must come back) +
  *           CLOSE 1008 → alert + re-dial;
  *   conn 1: HTTP 401 → token refresh, immediate re-dial;
  *   conn 2: expects refreshed token; 101 + 2 text + 1 BINARY frame
  *           (high-bit bytes — the dropsonde protobuf path) +
  *           CLOSE 1000 → no alert, re-dial;
  *   conn 3: 101 + 2 text frames, held open → client stops at
  *           maxFrames = 7.
  */
class WebSocketReaderSpec extends AnyFunSuite {

  private val binPayload = Array[Byte](0x01, 0xFF.toByte, 0x80.toByte, 0x00, 0x7F)

  private def readReqHead(in: InputStream): Map[String, String] = {
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    val first = line()
    assert(first.startsWith("GET ") && first.endsWith(" HTTP/1.1"), first)
    val h = Map.newBuilder[String, String]
    h += ":path" -> first.stripPrefix("GET ").stripSuffix(" HTTP/1.1")
    var l = line()
    while (l.nonEmpty) {
      val i = l.indexOf(':')
      if (i > 0) h += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
      l = line()
    }
    h.result()
  }

  private def accept101(out: OutputStream, key: String): Unit = {
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${WebSocket.acceptKey(key)}\r\n\r\n").getBytes("UTF-8"))
    out.flush()
  }

  test("ws: handshake → frames → ping/pong → 1008 alert → 401 refresh → binary → resume") {
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val connIdx = new AtomicInteger(0)
    val seenTokens = new CopyOnWriteArrayList[String]()
    val pongs = new CopyOnWriteArrayList[String]()

    def handle(idx: Int, s: Socket): Unit = {
      val in = new java.io.BufferedInputStream(s.getInputStream)
      val out = s.getOutputStream
      val h = readReqHead(in)
      seenTokens.add(h.getOrElse("authorization", "<none>"))
      val key = h.getOrElse("sec-websocket-key", "")
      idx match {
        case 0 =>
          accept101(out, key)
          WebSocket.writeFrame(out, WebSocket.OpText, "f0".getBytes, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpText, "f1".getBytes, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpPing, "hb-1".getBytes, mask = false)
          val pong = WebSocket.readFrame(in) // client must answer the ping
          if (pong.opcode == WebSocket.OpPong) pongs.add(pong.text)
          WebSocket.writeFrame(out, WebSocket.OpClose,
            WebSocket.closePayload(1008, "too slow"), mask = false)
          s.close()
        case 1 =>
          out.write("HTTP/1.1 401 Unauthorized\r\n\r\n".getBytes("UTF-8"))
          out.flush(); s.close()
        case 2 =>
          accept101(out, key)
          WebSocket.writeFrame(out, WebSocket.OpText, "f2".getBytes, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpText, "f3".getBytes, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpBinary, binPayload, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpClose,
            WebSocket.closePayload(1000, "bye"), mask = false)
          s.close()
        case _ =>
          accept101(out, key)
          WebSocket.writeFrame(out, WebSocket.OpText, "f5".getBytes, mask = false)
          WebSocket.writeFrame(out, WebSocket.OpText, "f6".getBytes, mask = false)
          Thread.sleep(5000) // held open; client stops at maxFrames
          s.close()
      }
    }

    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val s = server.accept()
          val idx = connIdx.getAndIncrement()
          val t = new Thread(() => try handle(idx, s) catch { case _: Exception => () })
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    val fetches = new AtomicInteger(0)
    val fetcher = new Connector.TokenFetcher(
      "https://uaa.example", "u", "p", () => s"tok-${fetches.incrementAndGet()}")
    val backoff = new Connector.Backoff(minDelayMs = 10, maxDelayMs = 50, maxRetries = 10)
    val received = new CopyOnWriteArrayList[String]()
    val alerts = new CopyOnWriteArrayList[String]()

    try {
      val result = NozzleReader.runWs(
        "127.0.0.1", server.getLocalPort, fetcher, backoff,
        idleTimeoutMs = 2000, maxFrames = 7,
        onFrame = received.add(_), onAlert = alerts.add(_))

      val stats = result.fold(e => fail(s"reader failed: $e"), identity)
      assert(stats.frames === 7L)
      assert(stats.dials === 4L, "conn0 + 401 + conn2 + conn3")
      assert(stats.refreshes === 1L)
      assert(stats.alerts === 1L, "exactly the 1008 close alerts; 1000 must not")

      // the 1008 close surfaced on the O4 side channel with the
      // reference's detector message, and the reader STILL re-dialed
      assert(alerts.size === 1)
      assert(alerts.get(0).contains("connection is too slow (ClosePolicyViolation)"))

      // frames in order; the binary frame survives byte-exact via the
      // ISO-8859-1 string surface
      val fs = java.util.Collections.list(java.util.Collections.enumeration(received))
      assert(fs.get(0) === "f0" && fs.get(1) === "f1")
      assert(fs.get(2) === "f2" && fs.get(3) === "f3")
      assert(fs.get(4) === new String(binPayload, "ISO-8859-1"))
      assert(fs.get(4).getBytes("ISO-8859-1") === binPayload)
      assert(fs.get(5) === "f5" && fs.get(6) === "f6")

      // ping answered with an echoing pong before the close
      assert(pongs.size === 1 && pongs.get(0) === "hb-1")

      // token lifecycle: conn0 and the 401 see tok-1, the re-dial
      // after refresh presents tok-2
      assert(seenTokens.get(0) === "tok-1" && seenTokens.get(1) === "tok-1")
      assert(seenTokens.get(2) === "tok-2" && seenTokens.get(3) === "tok-2")
    } finally server.close()
  }

  test("ws e2e: readStream protocol=ws serves frames as rows and 1008 bumps the O4 counter") {
    val spark = SparkTestSession.spark
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val connIdx = new AtomicInteger(0)
    val paths = new CopyOnWriteArrayList[String]()

    def handle(idx: Int, s: Socket): Unit = {
      val in = new java.io.BufferedInputStream(s.getInputStream)
      val out = s.getOutputStream
      val h = readReqHead(in)
      paths.add(h.getOrElse(":path", "<none>"))
      accept101(out, h.getOrElse("sec-websocket-key", ""))
      if (idx == 0) {
        (0 until 3).foreach(i =>
          WebSocket.writeFrame(out, WebSocket.OpText, s"wf$i".getBytes, mask = false))
        WebSocket.writeFrame(out, WebSocket.OpClose,
          WebSocket.closePayload(1008, "too slow"), mask = false)
        s.close()
      } else {
        (3 until 6).foreach(i =>
          WebSocket.writeFrame(out, WebSocket.OpText, s"wf$i".getBytes, mask = false))
        Thread.sleep(20000) // hold open until the test ends
        s.close()
      }
    }

    val acceptor = new Thread(() => {
      try while (!server.isClosed) {
        val s = server.accept()
        val idx = connIdx.getAndIncrement()
        val t = new Thread(() => try handle(idx, s) catch { case _: Exception => () })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    val baseline = graft.sources.FirehoseSocketSource.slowConsumerAlerts.get()
    val ck = java.nio.file.Files.createTempDirectory("ws-src-ck").toString
    val q = spark.readStream.format("graft-firehose-socket")
      .option("host", "127.0.0.1")
      .option("port", server.getLocalPort)
      .option("protocol", "ws")
      .option("subscriptionId", "graft-sub-7")
      .option("filterType", "metrics")
      .option("idleTimeoutMs", 60000)
      .option("backoffMinMs", 10)
      .option("backoffMaxMs", 50)
      .load()
      .writeStream
      .format("memory")
      .queryName("ws_frames")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()

    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def count(): Long = spark.sql("SELECT count(*) FROM ws_frames").head().getLong(0)
      while (count() < 6 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(count() === 6, s"conns=${connIdx.get()}")
      val got = spark.sql("SELECT frame FROM ws_frames").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(got === (0 until 6).map(i => s"wf$i"))
      // the 1008 close crossed the reconnect AND surfaced as an alert
      assert(graft.sources.FirehoseSocketSource.slowConsumerAlerts.get() === baseline + 1)
      // the stream path carries the subscription id (firehose.go:42-44)
      // and the server-side filter query param (filter.go:10-20)
      assert(paths.get(0) === "/firehose/graft-sub-7?filter-type=metrics", paths)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("ws: one alert per 1008 close; the successful handshake keeps resetting the budget") {
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def handle(s: Socket): Unit = {
      val in = new java.io.BufferedInputStream(s.getInputStream)
      val out = s.getOutputStream
      val h = readReqHead(in)
      accept101(out, h.getOrElse("sec-websocket-key", ""))
      WebSocket.writeFrame(out, WebSocket.OpClose,
        WebSocket.closePayload(1008, "too slow"), mask = false)
      s.close()
    }
    val acceptor = new Thread(() => {
      try while (!server.isClosed) {
        val s = server.accept()
        val t = new Thread(() => try handle(s) catch { case _: Exception => () })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    val fetcher = new Connector.TokenFetcher("https://uaa.example", "u", "p", () => "tok")
    val backoff = new Connector.Backoff(minDelayMs = 5, maxDelayMs = 10, maxRetries = 3)
    val alerts = new CopyOnWriteArrayList[String]()
    try {
      // every connection closes 1008 with no frames. Each dial's
      // SUCCESSFUL handshake resets the retry budget (reference
      // semantics: onConnected resets backoff), so the loop never
      // exhausts — the caller's stop signal is what ends it, and the
      // alert count tracks the closes one-to-one.
      val result = NozzleReader.runWs(
        "127.0.0.1", server.getLocalPort, fetcher, backoff,
        idleTimeoutMs = 2000, maxFrames = 10,
        onFrame = _ => (), onAlert = alerts.add(_),
        shouldStop = () => alerts.size >= 4)
      val stats = result.fold(e => fail(s"reader failed: $e"), identity)
      assert(stats.frames === 0L)
      assert(stats.alerts >= 4L, "one alert per 1008 close")
      assert(alerts.size === stats.alerts)
    } finally server.close()
  }
}
