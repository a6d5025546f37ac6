package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PqAdc (native asymmetric-distance computation) parity with the HOF
  * formulation it replaced in q69/q70 — exact equality, not
  * approximate: the kernel must reproduce the same sequential folds
  * (per-subspace left-to-right, then subspace order) and the same
  * cid-keyed first-match codebook lookup. */
class PqAdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def hofAdist: String = {
    def subv(c: String, m: Int) =
      s"transform(slice($c, ${m * 16 + 1}, 16), x -> cast(x as double))"
    def d2(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"
    val dists = (0 until 4).map(m =>
      d2(subv("qv", m),
        s"slice(element_at(filter(cb, c -> c.cid = element_at(codes, ${m + 1})), 1).cv, ${m * 16 + 1}, 16)"))
    s"aggregate(array(${dists.mkString(", ")}), 0D, (acc, v) -> acc + v)"
  }

  test("pq_adc equals the aggregate/zip_with/filter tower on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
    val cbs = emb.filter(col("vec_id").between(1, 8))
      .agg(sort_array(collect_list(struct(
        col("vec_id").cast("long").as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("cv")))).as("cb"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(cbs))
      .select(col("vec_id"), col("cb"),
        graft.Functions.pq_codes(col("embedding"), col("cb"), 16).as("codes"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.Functions.pq_adc(col("qv"), col("cb"), col("codes"), 16, 4)
          .as("native"),
        expr(hofAdist).as("hof"))
    // exact double equality (<=> for null-safety) plus the decimal
    // repr — NaN/−0.0 cannot arise from sums of squares, so equal
    // values here mean equal bits
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
    assert(both.filter(not(col("native").cast("string")
      <=> col("hof").cast("string"))).count() === 0)
    assert(both.count() > 0)
  }

  test("pq_adc poisons to NULL like the HOF: missing cid, short codes, null elements, unequal slices") {
    val r = spark.sql(
      """SELECT
        |  pq_adc(cast(array(1.0, 2.0) as array<double>),
        |    array(struct(cast(1 as bigint) as cid, cast(array(3.0, 5.0) as array<double>) as cv)),
        |    cast(array(1, 1) as array<bigint>), 1, 2) AS ok,
        |  pq_adc(cast(array(1.0, 2.0) as array<double>),
        |    array(struct(cast(1 as bigint) as cid, cast(array(3.0, 5.0) as array<double>) as cv)),
        |    cast(array(1, 9) as array<bigint>), 1, 2) AS miss,
        |  pq_adc(cast(array(1.0, 2.0) as array<double>),
        |    array(struct(cast(1 as bigint) as cid, cast(array(3.0, 5.0) as array<double>) as cv)),
        |    cast(array(1) as array<bigint>), 1, 2) AS short_codes,
        |  pq_adc(cast(array(1.0, null) as array<double>),
        |    array(struct(cast(1 as bigint) as cid, cast(array(3.0, 5.0) as array<double>) as cv)),
        |    cast(array(1, 1) as array<bigint>), 1, 2) AS nul_elem,
        |  pq_adc(cast(array(1.0, 2.0) as array<double>),
        |    array(struct(cast(1 as bigint) as cid, cast(array(3.0) as array<double>) as cv)),
        |    cast(array(1, 1) as array<bigint>), 1, 2) AS uneq
        |""".stripMargin)
    val row = r.head()
    // ok: (1-3)^2 + (2-5)^2 = 4 + 9 = 13
    assert(row.getDouble(0) === 13.0)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("pq_adc lookup is cid-keyed, first match wins, null entries skipped") {
    // codebook deliberately NOT position-aligned with cids, with a
    // NULL entry in front — the lookup must skip it and key by cid
    val r = spark.sql(
      """SELECT pq_adc(cast(array(0.0, 0.0) as array<double>),
        |  array(cast(null as struct<cid: bigint, cv: array<double>>),
        |        struct(cast(7 as bigint) as cid, cast(array(2.0, 9.0) as array<double>) as cv),
        |        struct(cast(3 as bigint) as cid, cast(array(1.0, 1.0) as array<double>) as cv)),
        |  cast(array(3, 7) as array<bigint>), 1, 2)
        |""".stripMargin).head().getDouble(0)
    // subspace 0 -> cid 3 slice [1.0] : d2 = 1; subspace 1 -> cid 7 slice [9.0] : d2 = 81
    assert(r === 82.0)
  }
}
