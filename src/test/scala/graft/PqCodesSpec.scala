package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PqCodes (native PQ encoding) parity with the HOF formulation it
  * replaced in q69/q70 — exact equality, not approximate: the kernel
  * must reproduce the same sequential fold and (d2, cid) tie order. */
class PqCodesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def hofCodes(m: Int): String = {
    def subv(c: String) = s"transform(slice($c, ${m * 16 + 1}, 16), x -> cast(x as double))"
    def d2(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"
    s"array_min(transform(cb, c -> struct(${d2(subv("embedding"), s"slice(c.cv, ${m * 16 + 1}, 16)")} as d2, c.cid as cid))).cid"
  }

  test("pq_codes equals the array_min/transform/zip_with tower on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
    val cbs = emb.filter(col("vec_id").between(1, 8))
      .agg(sort_array(collect_list(struct(
        col("vec_id").cast("long").as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("cv")))).as("cb"))
    val both = emb.crossJoin(broadcast(cbs))
      .select(col("vec_id"),
        graft.Functions.pq_codes(col("embedding"), col("cb"), 16).as("native"),
        expr(s"array(${(0 until 4).map(hofCodes).mkString(", ")})").as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
    assert(both.count() > 0)
  }

  test("pq_codes poisons to NULL on null elements and bad shapes") {
    val df = spark.sql(
      """SELECT pq_codes(cast(array(1.0, 2.0) as array<double>),
        |  array(struct(cast(1 as bigint) as cid, cast(array(0.0, 0.0) as array<double>) as cv)), 2) AS ok,
        |  pq_codes(cast(array(1.0, null) as array<double>),
        |  array(struct(cast(1 as bigint) as cid, cast(array(0.0, 0.0) as array<double>) as cv)), 2) AS nul,
        |  pq_codes(cast(array(1.0, 2.0, 3.0) as array<double>),
        |  array(struct(cast(1 as bigint) as cid, cast(array(0.0, 0.0, 0.0) as array<double>) as cv)), 2) AS odd,
        |  pq_codes(cast(array(1.0, 2.0) as array<double>),
        |  array(struct(cast(1 as bigint) as cid, cast(array(0.0) as array<double>) as cv)), 2) AS short
        |""".stripMargin)
    val r = df.head()
    assert(r.getSeq[Long](0) == Seq(1L))
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("tie on d2 breaks to the smaller cid, matching struct array_min order") {
    val r = spark.sql(
      """SELECT pq_codes(cast(array(0.0, 0.0) as array<double>),
        |  array(struct(cast(7 as bigint) as cid, cast(array(1.0, 0.0) as array<double>) as cv),
        |        struct(cast(3 as bigint) as cid, cast(array(0.0, 1.0) as array<double>) as cv)), 2)
        |""".stripMargin).head().getSeq[Long](0)
    assert(r == Seq(3L))
  }
}
