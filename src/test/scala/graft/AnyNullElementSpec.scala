package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AnyNullElement (native null-element sweep) parity with the
  * `exists(arr, isnull)` HOF pre-filter it replaced across the
  * similarity family. */
class AnyNullElementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("any_null equals exists(arr, isnull) on every shape, including NULL array") {
    val r = spark.sql(
      """SELECT any_null(array(1, 2, 3)) a,
        |       any_null(array(1, cast(null as int), 3)) b,
        |       any_null(cast(array() as array<int>)) c,
        |       any_null(cast(null as array<int>)) d,
        |       any_null(array(cast(null as string))) e
        |""".stripMargin).head()
    assert(!r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    assert(r.isNullAt(3))
    assert(r.getBoolean(4))
  }

  test("any_null filter keeps exactly the rows the HOF filter keeps on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val hof = emb.filter(!exists(col("embedding"), _.isNull))
      .select("vec_id")
    val native = emb.filter(!graft.Functions.any_null(col("embedding")))
      .select("vec_id")
    assert(hof.exceptAll(native).count() === 0)
    assert(native.exceptAll(hof).count() === 0)
    assert(native.count() > 0)
  }
}
