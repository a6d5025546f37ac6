package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}

/** The network edge of O1: a thin line-framed TCP reader that wires
  * the connector control plane ([[Connector.TokenFetcher]],
  * [[Connector.Backoff]]) into an actual dial→read loop, mirroring the
  * reference consumer's connection lifecycle (noaa
  * consumer/async.go):
  *
  *  - per-read idle deadline (async.go:255-257 `SetReadDeadline`): a
  *    silent connection trips `SO_TIMEOUT` and is torn down and
  *    re-dialed — timeouts are retryable (async.go:267-269);
  *  - retry loop with exponential sleep and budget
  *    (async.go:298-351 `retryAction`): every retryable failure —
  *    refused dial, mid-stream EOF, idle timeout — consumes backoff
  *    budget; a successful handshake resets it (the onConnect
  *    callback, async.go:307-313);
  *  - 401 at handshake → refresh the token and re-dial ONCE
  *    immediately (async.go:372-406 `websocketConn` /
  *    `websocketConnNewToken`); a second 401 is an ordinary retryable
  *    error;
  *  - malformed frames are the CONSUMER's problem (async.go:274-280
  *    skips frames that fail proto.Unmarshal and keeps the
  *    connection): the reader delivers raw frames; decode-and-drop
  *    happens downstream via `envelope_decode` → NULL.
  *
  * Protocol (the loopback-testable distillation of the websocket
  * handshake): client sends `AUTH <token>\n`; server answers `OK` or
  * `401`; after `OK` every subsequent line is one frame.
  *
  * The reader is transport only — it feeds frames to `onFrame` and
  * stops after `maxFrames` (tests) or when the retry budget is
  * exhausted; a production caller runs it on a source thread and
  * pumps frames into the decode path (FirehoseSource's row surface).
  */
object NozzleReader {

  /** Lifecycle counters surfaced for assertions/metrics. */
  final case class ReaderStats(frames: Long, dials: Long, refreshes: Long)

  def run(
      host: String,
      port: Int,
      fetcher: Connector.TokenFetcher,
      backoff: Connector.Backoff,
      idleTimeoutMs: Int,
      maxFrames: Long,
      onFrame: String => Unit,
      shouldStop: () => Boolean = () => false,
      onSocket: Socket => Unit = _ => ()): Either[String, ReaderStats] = {
    var dials = 0L
    var refreshes = 0L
    var frames = 0L
    var token: String = fetcher.fetch() match {
      case Left(e) => return Left(s"token fetch failed: $e")
      case Right(t) => t
    }
    var result: Either[String, ReaderStats] = null
    while (result == null) {
      if (shouldStop())
        return Right(ReaderStats(frames, dials, refreshes)) // conn.Close() analogue
      var retryable: String = null
      var redial401 = true
      var refreshedThisDial = false
      while (redial401 && result == null) {
        redial401 = false
        var sock: Socket = null
        try {
          sock = new Socket()
          sock.connect(new InetSocketAddress(host, port), idleTimeoutMs)
          sock.setSoTimeout(idleTimeoutMs) // the idle read deadline
          onSocket(sock) // expose for external teardown (stream stop)
          dials += 1
          val out = new OutputStreamWriter(sock.getOutputStream, "UTF-8")
          val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
          out.write(s"AUTH $token\n")
          out.flush()
          in.readLine() match {
            case "OK" =>
              backoff.onConnected() // reset delay + budget
              var line = in.readLine()
              while (line != null && result == null) {
                onFrame(line)
                frames += 1
                if (frames >= maxFrames || shouldStop())
                  result = Right(ReaderStats(frames, dials, refreshes))
                else line = in.readLine()
              }
              if (result == null && shouldStop())
                result = Right(ReaderStats(frames, dials, refreshes))
              if (result == null) retryable = "connection closed mid-stream"
            case "401" =>
              if (!refreshedThisDial) fetcher.refresh() match {
                case Left(e) => result = Left(s"token refresh failed: $e")
                case Right(t) =>
                  token = t; refreshes += 1
                  refreshedThisDial = true; redial401 = true
              }
              else retryable = "unauthorized after token refresh"
            case other => retryable = s"bad handshake: $other"
          }
        } catch {
          case _: SocketTimeoutException => retryable = "i/o timeout (idle)"
          case e: java.io.IOException => retryable = s"connection error: ${e.getMessage}"
        } finally if (sock != null) sock.close()
      }
      if (result == null && retryable != null) backoff.nextDelayMs() match {
        case None => result = Left(s"max retries reached (last: $retryable)")
        case Some(d) =>
          // an interrupt (external stop) just ends the sleep early;
          // the loop head re-checks shouldStop
          try Thread.sleep(d) catch { case _: InterruptedException => () }
      }
    }
    result
  }
}
