package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Seeded fuzz: encode∘decode = identity over random envelopes —
  * exercises escaping, unicode, unsigned 64-bit, omission, maps and
  * arrays far beyond the golden fixtures. */
class EnvelopeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rnd = new scala.util.Random(20260812)

  private def opt[T](v: => T): Option[T] =
    if (rnd.nextBoolean()) Some(v) else None

  /** Valid (no unpaired surrogates) string with escape-worthy chars. */
  private def str(): String = {
    val pool = "ab \"\\\n\t<>&€日_0/{}[]:,'~ "
    Seq.fill(rnd.nextInt(12))(pool.charAt(rnd.nextInt(pool.length))).mkString
  }

  private def uuid() = Uuid(rnd.nextLong(), rnd.nextLong())

  private def envelope(): Envelope = Envelope(
    origin = opt(str()),
    eventType = opt(rnd.nextInt(12) - 1),
    timestamp = opt(rnd.nextLong()),
    deployment = opt(str()), job = opt(str()), index = opt(str()), ip = opt(str()),
    // non-empty or absent: the wire form cannot distinguish Some(empty)
    // from None (omit-if-empty), so canonical envelopes never carry
    // empty maps/arrays/bytes
    tags = opt(Seq.fill(rnd.nextInt(3) + 1)(str() -> str())
      .zipWithIndex.map { case ((k, v), i) => s"$i$k" -> v }.toMap), // unique keys
    httpStartStop = opt(HttpStartStop(
      opt(rnd.nextLong()), opt(rnd.nextLong()), opt(uuid()),
      opt(rnd.nextInt(3)), opt(rnd.nextInt(44)), opt(str()), opt(str()),
      opt(str()), opt(rnd.nextInt(600)), opt(rnd.nextLong()), opt(uuid()),
      opt(rnd.nextInt(10)), opt(str()),
      opt(Seq.fill(rnd.nextInt(3) + 1)(str())))), // non-empty or absent
    logMessage = opt(LogMessage(
      opt(Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(256).toByte)),
      opt(rnd.nextInt(2) + 1), opt(rnd.nextLong()), opt(str()), opt(str()), opt(str()))),
    valueMetric = opt(ValueMetric(opt(str()), opt(rnd.nextDouble() * 1e6), opt(str()))),
    counterEvent = opt(CounterEvent(opt(str()), opt(rnd.nextLong()), opt(rnd.nextLong()))),
    error = opt(ErrorEvent(opt(str()), opt(rnd.nextInt(100)), opt(str()))),
    containerMetric = opt(ContainerMetric(opt(str()), opt(rnd.nextInt(8)),
      opt(rnd.nextDouble() * 100), opt(rnd.nextLong()), opt(rnd.nextLong()),
      opt(rnd.nextLong()), opt(rnd.nextLong()))))

  test("encode -> decode round-trips 300 random envelopes byte-faithfully") {
    val spark2 = spark
    import spark2.implicits._
    val envs = Seq.fill(300)(envelope())
    val df = envs.toDS().toDF()
    val decoded = df
      .select(Functions.envelope_json(struct(df.columns.map(col): _*)).as("j"))
      .select(Functions.envelope_decode(col("j")).as("e"))
      .select("e.*").as[Envelope].collect().toSeq
    assert(decoded.length === envs.length)
    decoded.zip(envs).zipWithIndex.foreach { case ((got, want), i) =>
      // Array[Byte] equality is referential; compare via normalized view
      def key(e: Envelope) =
        (e.copy(logMessage = None),
          e.logMessage.map(_.copy(message = None)),
          e.logMessage.flatMap(_.message).map(_.toSeq))
      assert(key(got) === key(want), s"fuzz case $i diverged")
    }
  }

  test("every encoded payload is valid JSON (decode never drops)") {
    val spark2 = spark
    import spark2.implicits._
    val envs = Seq.fill(100)(envelope())
    val df = envs.toDS().toDF()
    val dropped = df
      .select(Functions.envelope_json(struct(df.columns.map(col): _*)).as("j"))
      .select(Functions.envelope_decode(col("j")).as("e"))
      .filter(col("e").isNull)
    assert(dropped.count() === 0)
  }
}
