package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.config.GraftConfig
import graft.streaming.{NozzlePipeline, Stats, StatsReporter, StatsServer}
import graft.streaming.NozzlePipeline.Publisher

/** The engine's `CLI.Run` analogue (reference cli.go:73-376, traced in
  * SURVEY §3.1): load config, resolve flag > config > default
  * precedence, assemble source → detector → route → encode → sink as
  * one streaming query, stand up the stats plane (listener + HTTP
  * server + periodic reporter), run until stopped, and shut down
  * gracefully (stop queries → checkpoints make the restart resume).
  *
  * Assembly is exposed as [[NozzleApp]] so tests (and embedders) can
  * run the whole lifecycle against bounded sources and in-memory
  * sinks; [[NozzleMain.main]] is the thin argv wrapper.
  */
object NozzleApp {

  final case class Running(
      spark: SparkSession,
      stats: Stats,
      query: StreamingQuery,
      alerts: StreamingQuery,
      server: Option[StatsServer],
      reporter: Option[StatsReporter],
      listener: NozzlePipeline.Listener) {

    /** O20: graceful shutdown — stop queries, close the stats plane.
      * Checkpoints carry the resume point. */
    def shutdown(): Unit = {
      query.stop()
      alerts.stop()
      reporter.foreach(_.stop())
      server.foreach(_.stop())
      spark.streams.removeListener(listener)
    }

    def awaitTermination(): Unit = {
      query.awaitTermination()
      alerts.awaitTermination()
    }
  }

  /** Assemble and start the full pipeline.
    *
    * @param source the envelope-surrogate stream (graft-firehose or
    *               file replay)
    * @param publisher sink target; None = debug/console-style memory
    *                  accounting only (reference -debug mode)
    */
  def start(
      spark: SparkSession,
      cfg: GraftConfig,
      source: DataFrame,
      checkpointDir: String,
      dlqPath: String,
      publisher: Option[Publisher],
      statsPort: Option[Int] = None,
      statsIntervalMs: Long = 10000,
      log: String => Unit = s => System.err.println(s"[nozzle] $s")): Running = {

    val resolved = GraftConfig.resolve(cfg)
    val stats = Stats()
    val listener = new NozzlePipeline.Listener(stats)
    spark.streams.addListener(listener)

    val routed = NozzlePipeline.build(source,
      GraftConfig.toRouting(resolved.kafka.topic))

    // main query: Kafka-sink stand-in with bounded retry + DLQ, or a
    // memory sink for debug mode
    val query = publisher match {
      case Some(p) =>
        val repartitionMax =
          if (resolved.kafka.repartitionMax != 0) resolved.kafka.repartitionMax
          else GraftConfig.DefaultRepartitionMax
        NozzlePipeline.startDlq(routed, s"$checkpointDir/main", p,
          repartitionMax, stats, dlqPath)
      case None =>
        NozzlePipeline.startMemory(routed, "nozzle_debug", s"$checkpointDir/main")
    }

    // O4 side-output: slow-consumer alerts over the same source
    val alerts = NozzlePipeline.startAlerts(
      NozzlePipeline.withEnvelope(source), s"$checkpointDir/alerts", stats)

    val server = statsPort.map(p => new StatsServer(stats, p).start())
    val reporter =
      if (statsIntervalMs > 0)
        Some(new StatsReporter(stats, statsIntervalMs, log).start())
      else None

    Running(spark, stats, query, alerts, server, reporter, listener)
  }
}

object NozzleMain {
  /** args: <config.toml> [checkpointDir] [dlqPath] | -version
    *
    * `-version`/`--version` prints "<name> version <version>" to
    * stderr and exits 0, before any config/Spark work — reference
    * cli.go:107,129-131. */
  def main(args: Array[String]): Unit = {
    if (args.exists(a => a == "-version" || a == "--version")) {
      System.err.println(BuildInfo.versionLine)
      return
    }
    val configPath = args.headOption.getOrElse("fixtures/basic.toml")
    val checkpoint = args.lift(1).getOrElse("/tmp/graft-nozzle/checkpoint")
    val dlqPath = args.lift(2).getOrElse("/tmp/graft-nozzle/dlq")
    val cfg = GraftConfig.load(configPath) match {
      case Right(c) => c
      case Left(err) => System.err.println(s"[nozzle] config: $err"); sys.exit(1)
    }
    val spark = GraftSession.local()
    GraftSession(spark)
    // Production state store: RocksDB keeps streaming state (dedup
    // sets, session windows, per-key state) off-heap and spillable —
    // required posture for watermark-bounded state at 100 TB.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = spark.readStream.format("graft-firehose")
      .option("rowsPerBatch", 5000)
      .load()
    val running = NozzleApp.start(spark, cfg, source, checkpoint, dlqPath,
      publisher = None, statsPort = Some(8080))
    sys.addShutdownHook(running.shutdown()) // O20: SIGINT → graceful stop
    running.awaitTermination()
  }
}
