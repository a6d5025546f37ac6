package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UuidStr

/** Golden + property tests for uuid_str.
  * Golden from reference kafka_test.go:542-555. */
class UuidStrSpec extends AnyFunSuite {

  test("golden: reference UUID round-trips byte-exactly") {
    val low = 0x7243cc580bc17af4L
    val high = 0x79d4c3b2020e67a5L
    assert(UuidStr.format(low, high) === "f47ac10b-58cc-4372-a567-0e02b2c3d479")
    assert(UuidStr.parse("f47ac10b-58cc-4372-a567-0e02b2c3d479") === ((low, high)))
  }

  test("golden: testAppId appears in httpStartStop routing form") {
    // helper_test.go:12-15 — str2uuid(testAppId) must format back.
    val (l, h) = UuidStr.parse("3356a5c7-e86c-442a-b14f-ce5cc4f80ed1")
    assert(UuidStr.format(l, h) === "3356a5c7-e86c-442a-b14f-ce5cc4f80ed1")
  }

  test("property: format/parse round-trip over the full 128-bit space") {
    val rnd = new scala.util.Random(42)
    val edges = Seq(0L, -1L, 1L, Long.MaxValue, Long.MinValue)
    val pairs =
      (for (l <- edges; h <- edges) yield (l, h)) ++
        Seq.fill(10000)((rnd.nextLong(), rnd.nextLong()))
    pairs.foreach { case (low, high) =>
      val s = UuidStr.format(low, high)
      assert(s.length === 36)
      assert(UuidStr.parse(s) === ((low, high)), s"for ($low, $high) -> $s")
    }
  }

  test("expression evaluates and codegens inside a query") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((0x7243cc580bc17af4L, 0x79d4c3b2020e67a5L)).toDF("lo", "hi")
      .select(Functions.uuid_str($"lo", $"hi").as("u"))
    assert(df.as[String].head === "f47ac10b-58cc-4372-a567-0e02b2c3d479")
    // SQL-registered name works too
    Functions.register(spark)
    val viaSql = spark.sql(
      s"SELECT uuid_str(${0x7243cc580bc17af4L}L, ${0x79d4c3b2020e67a5L}L) AS u")
    assert(viaSql.as[String].head === "f47ac10b-58cc-4372-a567-0e02b2c3d479")
    // NULL in → NULL out (nullIntolerant)
    val n = Seq((Option.empty[Long], Option(1L))).toDF("lo", "hi")
      .select(Functions.uuid_str($"lo", $"hi").as("u"))
    assert(n.collect()(0).isNullAt(0))
  }
}
