package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The stats plane's query surface (O15) and periodic reporter (O17).
  *
  * [[StatsServer]] is the reference's HTTP server (server.go:31-85):
  * `GET /stats/app` returns the live [[Stats]] JSON snapshot,
  * `GET /stats/runtime` returns JVM runtime counters (the Go runtime
  * stats analogue), and `GET /debug/jvm` is the `/debug/pprof`
  * analogue (server.go:33-38): a plain-text JVM profile — thread
  * dump with states and stack traces, heap/GC counters — the
  * diagnostics an operator pulls when the pipeline wedges. Uses the
  * JDK's built-in HTTP server — no deps.
  *
  * [[StatsReporter]] is the display ticker (cli.go:241-262): every
  * interval it emits the same counter lines the reference logs,
  * through an injectable sink so tests (and alternative loggers) can
  * capture them.
  */
final class StatsServer(stats: Stats, port: Int) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/stats/app", (ex: HttpExchange) =>
    respond(ex, 200, stats.json()))
  server.createContext("/stats/runtime", { (ex: HttpExchange) =>
    val rt = Runtime.getRuntime
    respond(ex, 200,
      s"""{"version":"${graft.BuildInfo.Version}",""" +
        s""""goroutine_num":${Thread.activeCount()},""" +
        s""""heap_alloc":${rt.totalMemory() - rt.freeMemory()},""" +
        s""""heap_sys":${rt.totalMemory()},""" +
        s""""cpu_num":${rt.availableProcessors()}}""")
  })
  server.createContext("/debug/jvm", { (ex: HttpExchange) =>
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    val sb = new StringBuilder(8192)
    sb.append("heap_used ").append(mem.getHeapMemoryUsage.getUsed).append('\n')
    sb.append("heap_committed ").append(mem.getHeapMemoryUsage.getCommitted).append('\n')
    gcs.forEach { gc =>
      sb.append("gc ").append(gc.getName.replace(' ', '_'))
        .append(" count ").append(gc.getCollectionCount)
        .append(" time_ms ").append(gc.getCollectionTime).append('\n')
    }
    sb.append('\n')
    Thread.getAllStackTraces.forEach { (t, frames) =>
      sb.append(s"thread ${t.getName} ${t.getState}\n")
      frames.foreach(f => sb.append("  at ").append(f).append('\n'))
    }
    val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  })
  server.setExecutor(null)

  def start(): StatsServer = { server.start(); this }
  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

final class StatsReporter(stats: Stats, intervalMs: Long, log: String => Unit) {
  private var exec: ScheduledExecutorService = _

  /** One report tick — the exact counter lines of cli.go:243-261. */
  def report(): Unit = {
    log(s"Consume per sec: ${stats.consumePerSec}")
    log(s"Consumed messages: ${stats.consume.get()}")
    log(s"Publish per sec: ${stats.publishPerSec}")
    log(s"Published messages: ${stats.publish.get()}")
    log(s"Publish delay: ${stats.consume.get() - stats.publish.get() - stats.publishFail.get()}")
    log(s"SubInput buffer: ${stats.subInputBuffer.get()}")
    log(s"Failed consume: ${stats.consumeFail.get()}")
    log(s"Failed publish: ${stats.publishFail.get()}")
    log(s"SlowConsumer alerts: ${stats.slowConsumerAlert.get()}")
  }

  def start(): StatsReporter = synchronized {
    exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-stats-reporter"); t.setDaemon(true); t
    }
    exec.scheduleAtFixedRate(() => report(), intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    this
  }

  def stop(): Unit = synchronized { if (exec != null) exec.shutdownNow() }
}
