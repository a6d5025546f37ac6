package graft

import graft.model._

/** Seeded random-envelope generator shared by the codec fuzz suites
  * (JSON and protobuf wire). Canonical-form constraint: the wire forms
  * cannot distinguish Some(empty) from None for maps/arrays/bytes
  * (omit-if-empty), so generated envelopes never carry empty ones. */
final class EnvelopeGen(seed: Long) {
  private val rnd = new scala.util.Random(seed)

  private def opt[T](v: => T): Option[T] =
    if (rnd.nextBoolean()) Some(v) else None

  /** Valid (no unpaired surrogates) string with escape-worthy chars:
    * quotes, backslash, control chars (incl. ), HTML escapes,
    * multibyte UTF-8, and the JSONP-hazard U+2028. */
  def str(): String = {
    val pool = "ab \"\\\n\t<>&€日_0/{}[]:,'~ "
    Seq.fill(rnd.nextInt(12))(pool.charAt(rnd.nextInt(pool.length))).mkString
  }

  private def uuid() = Uuid(rnd.nextLong(), rnd.nextLong())

  def envelope(): Envelope = Envelope(
    origin = opt(str()),
    eventType = opt(rnd.nextInt(12) - 1),
    timestamp = opt(rnd.nextLong()),
    deployment = opt(str()), job = opt(str()), index = opt(str()), ip = opt(str()),
    tags = opt(Seq.fill(rnd.nextInt(3) + 1)(str() -> str())
      .zipWithIndex.map { case ((k, v), i) => s"$i$k" -> v }.toMap), // unique keys
    httpStartStop = opt(HttpStartStop(
      opt(rnd.nextLong()), opt(rnd.nextLong()), opt(uuid()),
      opt(rnd.nextInt(3)), opt(rnd.nextInt(44)), opt(str()), opt(str()),
      opt(str()), opt(rnd.nextInt(600)), opt(rnd.nextLong()), opt(uuid()),
      opt(rnd.nextInt(10)), opt(str()),
      opt(Seq.fill(rnd.nextInt(3) + 1)(str())))),
    logMessage = opt(LogMessage(
      opt(Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(256).toByte)),
      opt(rnd.nextInt(2) + 1), opt(rnd.nextLong()), opt(str()), opt(str()), opt(str()))),
    valueMetric = opt(ValueMetric(opt(str()), opt(rnd.nextDouble() * 1e6), opt(str()))),
    counterEvent = opt(CounterEvent(opt(str()), opt(rnd.nextLong()), opt(rnd.nextLong()))),
    error = opt(ErrorEvent(opt(str()), opt(rnd.nextInt(100)), opt(str()))),
    containerMetric = opt(ContainerMetric(opt(str()), opt(rnd.nextInt(8)),
      opt(rnd.nextDouble() * 100), opt(rnd.nextLong()), opt(rnd.nextLong()),
      opt(rnd.nextLong()), opt(rnd.nextLong()))))

  /** Normalized comparison key: Array[Byte] equality is referential. */
  def key(e: Envelope): Any =
    (e.copy(logMessage = None),
      e.logMessage.map(_.copy(message = None)),
      e.logMessage.flatMap(_.message).map(_.toSeq))
}
