package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{CfConfig, GraftConfig}

/** Flag-surface parity with the reference CLI (cli.go:92-116) and the
  * flag > config > default precedence matrix (cli.go:157-179,
  * cli_test.go:10-24, config_test.go). Pure parser — no Spark. */
class NozzleCliSpec extends AnyFunSuite {
  private val noEnv = Map.empty[String, String]

  private def parse(args: String*): NozzleCli.CliOptions =
    NozzleCli.parse(args, noEnv).toOption.get

  test("-version and --version parse identically (cli_test.go:10-24)") {
    assert(parse("-version").version)
    assert(parse("--version").version)
    assert(!parse().version)
  }

  test("every reference flag parses, in both -flag v and -flag=v form") {
    val o = parse(
      "-config", "/tmp/c.toml", "-subscription", "sub1", "-username", "u1",
      "-password", "p1", "-log-level", "DEBUG", "-worker", "7",
      "-stats-interval", "5s", "-server", "-debug")
    assert(o.configPath === "/tmp/c.toml")
    assert(o.subscriptionID === "sub1")
    assert(o.username === "u1")
    assert(o.password === "p1")
    assert(o.logLevel === "DEBUG")
    assert(o.worker === 7)
    assert(o.statsIntervalMs === 5000L)
    assert(o.server && o.debug)

    val e = parse("-subscription=sub2", "-worker=3", "-stats-interval=250ms",
      "-debug=false", "-server=true")
    assert(e.subscriptionID === "sub2")
    assert(e.worker === 3)
    assert(e.statsIntervalMs === 250L)
    assert(!e.debug && e.server)
  }

  test("defaults mirror cli.go:29-53") {
    val o = parse()
    assert(o.subscriptionID === "" && o.username === "" && o.password === "")
    assert(o.logLevel === "INFO")
    assert(o.worker === Runtime.getRuntime.availableProcessors())
    assert(o.statsIntervalMs === 10000L) // DefaultStatsInterval = 10s
    assert(!o.server && !o.debug && !o.version)
  }

  test("subscription precedence: flag > config > default (cli.go:157-161)") {
    val cfgSet = GraftConfig(subscriptionID = "from-config")
    val cfgUnset = GraftConfig()
    // flag wins
    assert(GraftConfig.resolve(cfgSet,
      subscriptionID = parse("-subscription", "from-flag").subscriptionID)
      .subscriptionID === "from-flag")
    // config when flag unset
    assert(GraftConfig.resolve(cfgSet,
      subscriptionID = parse().subscriptionID).subscriptionID === "from-config")
    // default when neither
    assert(GraftConfig.resolve(cfgUnset, subscriptionID = parse().subscriptionID)
      .subscriptionID === GraftConfig.DefaultSubscriptionID)
  }

  test("username precedence: flag > config > \"admin\" (cli.go:163-167)") {
    val cfgSet = GraftConfig(cf = CfConfig(username = "cfg-user"))
    assert(GraftConfig.resolve(cfgSet,
      username = parse("-username", "flag-user").username)
      .cf.username === "flag-user")
    assert(GraftConfig.resolve(cfgSet, username = parse().username)
      .cf.username === "cfg-user")
    assert(GraftConfig.resolve(GraftConfig(), username = parse().username)
      .cf.username === GraftConfig.DefaultUsername)
  }

  test("password precedence: flag > $UAA_PASSWORD > config (cli.go:100,169-171)") {
    val cfg = GraftConfig(cf = CfConfig(password = "cfg-pass"))
    val env = Map(NozzleCli.EnvPassword -> "env-pass")
    // explicit flag beats the env default
    val flagged = NozzleCli.parse(Seq("-password", "flag-pass"), env).toOption.get
    assert(GraftConfig.resolve(cfg, password = flagged.password)
      .cf.password === "flag-pass")
    // env var IS the flag default (cli.go:100)
    val envOnly = NozzleCli.parse(Nil, env).toOption.get
    assert(GraftConfig.resolve(cfg, password = envOnly.password)
      .cf.password === "env-pass")
    // neither flag nor env → config survives
    assert(GraftConfig.resolve(cfg, password = parse().password)
      .cf.password === "cfg-pass")
  }

  test("Go duration grammar for -stats-interval") {
    assert(NozzleCli.parseDuration("10s") === Right(10000L))
    assert(NozzleCli.parseDuration("500ms") === Right(500L))
    assert(NozzleCli.parseDuration("1m30s") === Right(90000L))
    assert(NozzleCli.parseDuration("2h") === Right(7200000L))
    assert(NozzleCli.parseDuration("0") === Right(0L))
    assert(NozzleCli.parseDuration("10").isLeft) // Go: missing unit
    assert(NozzleCli.parseDuration("fast").isLeft)
    assert(NozzleCli.parse(Seq("-stats-interval", "nope"), noEnv).isLeft)
  }

  test("errors: unknown flag, missing operand, bad worker/bool") {
    assert(NozzleCli.parse(Seq("-no-such-flag"), noEnv) ===
      Left("flag provided but not defined: -no-such-flag"))
    assert(NozzleCli.parse(Seq("-username"), noEnv) ===
      Left("flag needs an argument: -username"))
    assert(NozzleCli.parse(Seq("-worker", "zero"), noEnv).isLeft)
    assert(NozzleCli.parse(Seq("-worker", "0"), noEnv).isLeft)
    assert(NozzleCli.parse(Seq("-debug=maybe"), noEnv).isLeft)
  }

  test("positional compatibility: <config> [checkpoint] [dlq], flags first (Go stops at the first non-flag)") {
    val o = parse("-debug", "cfg.toml", "/ck", "/dlq")
    assert(o.debug)
    assert(o.configPath === "cfg.toml")
    assert(o.checkpointDir === "/ck")
    assert(o.dlqPath === "/dlq")
    // an explicit -config flag wins over the positional
    val f = parse("-config", "flag.toml", "pos.toml", "/ck2")
    assert(f.configPath === "flag.toml")
    assert(f.checkpointDir === "/ck2")
    // Go semantics: a flag-looking token AFTER a positional is a positional
    val g = parse("cfg.toml", "-debug")
    assert(!g.debug && g.checkpointDir === "-debug")
  }

  test("log-level filter: DEBUG < INFO < ERROR, untagged lines are INFO (cli.go:136-143)") {
    def kept(min: String, lines: Seq[String]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val log = NozzleCli.levelLog(min, out += _)
      lines.foreach(log); out.toSeq
    }
    val lines = Seq("[DEBUG] d", "[INFO] i", "[ERROR] e", "untagged")
    assert(kept("DEBUG", lines) === lines)
    assert(kept("INFO", lines) === Seq("[INFO] i", "[ERROR] e", "untagged"))
    assert(kept("ERROR", lines) === Seq("[ERROR] e"))
  }
}
