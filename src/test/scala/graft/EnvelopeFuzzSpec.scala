package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Seeded fuzz: encode∘decode = identity over random envelopes —
  * exercises escaping, unicode, unsigned 64-bit, omission, maps and
  * arrays far beyond the golden fixtures. Generator shared with the
  * protobuf wire codec fuzz ([[EnvelopeGen]]). */
class EnvelopeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val gen = new EnvelopeGen(20260812)

  test("encode -> decode round-trips 300 random envelopes byte-faithfully") {
    val spark2 = spark
    import spark2.implicits._
    val envs = Seq.fill(300)(gen.envelope())
    val df = envs.toDS().toDF()
    val decoded = df
      .select(Functions.envelope_json(struct(df.columns.map(col): _*)).as("j"))
      .select(Functions.envelope_decode(col("j")).as("e"))
      .select("e.*").as[Envelope].collect().toSeq
    assert(decoded.length === envs.length)
    decoded.zip(envs).zipWithIndex.foreach { case ((got, want), i) =>
      // Array[Byte] equality is referential; compare via normalized view
      assert(gen.key(got) === gen.key(want), s"fuzz case $i diverged")
    }
  }

  test("every encoded payload is valid JSON (decode never drops)") {
    val spark2 = spark
    import spark2.implicits._
    val envs = Seq.fill(100)(gen.envelope())
    val df = envs.toDS().toDF()
    val dropped = df
      .select(Functions.envelope_json(struct(df.columns.map(col): _*)).as("j"))
      .select(Functions.envelope_decode(col("j")).as("e"))
      .filter(col("e").isNull)
    assert(dropped.count() === 0)
  }
}
