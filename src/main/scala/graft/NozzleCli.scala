package graft

/** Go-`flag`-style command line for the nozzle main — the reference's
  * full flag surface (cli.go:92-116) with the same semantics:
  *
  *   -config PATH          config file (default fixtures/basic.toml;
  *                         the reference defaults to its example TOML)
  *   -subscription ID      flag > config > default, cli.go:157-161
  *   -username NAME        flag > config > "admin", cli.go:163-167
  *   -password PASS        flag > $UAA_PASSWORD > config, cli.go:100
  *                         (the env var IS the flag's default value)
  *   -log-level LEVEL      DEBUG | INFO | ERROR filter, cli.go:136-143
  *   -worker NUM           source fan-out, default NumCPU, cli.go:103
  *   -stats-interval DUR   Go duration ("10s", "500ms"), cli.go:104
  *   -server               start the stats HTTP server, cli.go:186-193
  *   -debug                console/log producer instead of Kafka,
  *                         cli.go:224-227
  *   -version              print version to stderr, exit 0, cli.go:129-131
  *
  * Go parsing rules reproduced: `-flag` and `--flag` are equivalent;
  * values come as `-flag=v` or `-flag v`; bool flags take no operand
  * (only `-flag` or `-flag=true|false`); parsing stops at the first
  * non-flag argument. Trailing positionals keep this main's historical
  * `<config.toml> [checkpointDir] [dlqPath]` form (an explicit -config
  * flag wins over the positional). `-token` is intentionally absent:
  * the reference carries the CF token only in config (config.go:29),
  * never as a flag.
  *
  * The parser is pure (args + env in, options out) so the precedence
  * matrix is testable without Spark, mirroring cli_test.go:10-24 and
  * config_test.go.
  */
object NozzleCli {

  /** cli.go:57 — the password flag's default comes from this env var. */
  val EnvPassword = "UAA_PASSWORD"

  val DefaultCfgPath = "fixtures/basic.toml"
  val DefaultStatsIntervalMs = 10000L // cli.go:34-35, 10s
  val DefaultLogLevel = "INFO"
  val DefaultCheckpointDir = "/tmp/graft-nozzle/checkpoint"
  val DefaultDlqPath = "/tmp/graft-nozzle/dlq"

  final case class CliOptions(
      configPath: String = DefaultCfgPath,
      subscriptionID: String = "", // "" = unset → config → default
      username: String = "",
      password: String = "",
      logLevel: String = DefaultLogLevel,
      worker: Int = Runtime.getRuntime.availableProcessors(),
      statsIntervalMs: Long = DefaultStatsIntervalMs,
      server: Boolean = false,
      debug: Boolean = false,
      version: Boolean = false,
      checkpointDir: String = DefaultCheckpointDir,
      dlqPath: String = DefaultDlqPath)

  /** Go `time.ParseDuration` subset: one or more `<int><unit>`
    * segments with unit ∈ ms|s|m|h (e.g. "10s", "500ms", "1m30s");
    * bare "0" is valid like in Go. */
  def parseDuration(s: String): Either[String, Long] = {
    if (s == "0") return Right(0L)
    val seg = "([0-9]+)(ms|s|m|h)".r
    val ms = seg.findAllMatchIn(s).toSeq
    if (ms.isEmpty || ms.map(_.matched).mkString != s)
      Left(s"invalid duration: $s")
    else Right(ms.map { m =>
      m.group(1).toLong * (m.group(2) match {
        case "ms" => 1L
        case "s"  => 1000L
        case "m"  => 60000L
        case "h"  => 3600000L
      })
    }.sum)
  }

  private val boolFlags = Set("server", "debug", "version")
  private val valueFlags =
    Set("config", "subscription", "username", "password", "log-level",
      "worker", "stats-interval")

  def parse(args: Seq[String],
            env: Map[String, String] = sys.env): Either[String, CliOptions] = {
    var o = CliOptions(password = env.getOrElse(EnvPassword, ""))
    var configFromFlag = false
    val positionals = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var err: Option[String] = None
    var flagsDone = false
    while (i < args.length && err.isEmpty) {
      val a = args(i)
      val isFlag = !flagsDone && a.length > 1 && a.startsWith("-") &&
        a.dropWhile(_ == '-').nonEmpty
      if (!isFlag) {
        // Go: the first non-flag argument ends flag parsing
        flagsDone = true
        positionals += a
        i += 1
      } else {
        val body = a.dropWhile(_ == '-')
        val eq = body.indexOf('=')
        val name = if (eq >= 0) body.substring(0, eq) else body
        val inline = if (eq >= 0) Some(body.substring(eq + 1)) else None
        def operand(): Either[String, String] = inline match {
          case Some(v) => Right(v)
          case None =>
            if (i + 1 < args.length) { i += 1; Right(args(i)) }
            else Left(s"flag needs an argument: -$name")
        }
        if (boolFlags(name)) {
          val v = inline.getOrElse("true") match {
            case "true"  => Right(true)
            case "false" => Right(false)
            case other   => Left(s"invalid boolean value \"$other\" for -$name")
          }
          v match {
            case Right(b) =>
              name match {
                case "server"  => o = o.copy(server = b)
                case "debug"   => o = o.copy(debug = b)
                case "version" => o = o.copy(version = b)
              }
            case Left(e) => err = Some(e)
          }
          i += 1
        } else if (valueFlags(name)) {
          operand() match {
            case Right(v) =>
              name match {
                case "config" => o = o.copy(configPath = v); configFromFlag = true
                case "subscription" => o = o.copy(subscriptionID = v)
                case "username" => o = o.copy(username = v)
                case "password" => o = o.copy(password = v)
                case "log-level" => o = o.copy(logLevel = v)
                case "worker" =>
                  v.toIntOption match {
                    case Some(n) if n >= 1 => o = o.copy(worker = n)
                    case _ => err = Some(s"invalid value \"$v\" for -worker")
                  }
                case "stats-interval" =>
                  parseDuration(v) match {
                    case Right(msv) => o = o.copy(statsIntervalMs = msv)
                    case Left(e)    => err = Some(e)
                  }
              }
            case Left(e) => err = Some(e)
          }
          i += 1
        } else {
          err = Some(s"flag provided but not defined: -$name")
        }
      }
    }
    err match {
      case Some(e) => Left(e)
      case None =>
        // historical positional form: <config.toml> [checkpointDir] [dlqPath]
        if (positionals.nonEmpty && !configFromFlag)
          o = o.copy(configPath = positionals(0))
        if (positionals.length > 1) o = o.copy(checkpointDir = positionals(1))
        if (positionals.length > 2) o = o.copy(dlqPath = positionals(2))
        Right(o)
    }
  }

  /** Usage text printed on flag errors — the reference's `helpText`
    * (cli.go:96-98,405-431), adapted to this engine's surface. */
  val helpText: String =
    """graft-nozzle forwards envelope streams through the Spark engine.
      |
      |Usage:
      |
      |    graft-nozzle [options] [<config.toml> [checkpointDir] [dlqPath]]
      |
      |Available options:
      |
      |    -config PATH          Path to configuration file
      |    -subscription ID      Subscription ID for the firehose stream
      |    -username NAME        username to grant access token to connect firehose
      |    -password PASS        password to grant access token (default $UAA_PASSWORD)
      |    -worker NUM           Source fan-out partitions. Default is number of CPU cores
      |    -stats-interval TIME  How often to report stats (Go duration, e.g. 10s)
      |    -server               Start the stats HTTP server
      |    -debug                Route events to the debug sink instead of Kafka
      |    -log-level LEVEL      Log level. Default level is INFO (DEBUG|INFO|ERROR)
      |    -version              Print version and exit
      |""".stripMargin

  /** logutils.LevelFilter analogue (cli.go:136-143): lines tagged
    * [DEBUG]/[INFO]/[ERROR] pass iff at or above minLevel; untagged
    * lines count as INFO. */
  def levelLog(minLevel: String, out: String => Unit): String => Unit = {
    val order = Seq("DEBUG", "INFO", "ERROR")
    val min = math.max(0, order.indexOf(minLevel.toUpperCase))
    line => {
      val lvl = order.indexWhere(l => line.startsWith(s"[$l]"))
      if ((if (lvl == -1) 1 else lvl) >= min) out(line)
    }
  }
}
