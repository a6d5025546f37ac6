package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `gram3_agg` (the q194 rollup kernel): exact parity with the
  * char_ngrams explode + groupBy formulation it replaced, partition
  * invariance (the exactness discipline every graft aggregate pins),
  * and the out-of-alphabet skip rule. */
class Gram3AggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "

  private def gramOf(idx: Int): String =
    "" + alpha(idx / 1369) + alpha(idx / 37 % 37) + alpha(idx % 37)

  test("counts match the char_ngrams rollup exactly") {
    val t = Tables.documents(spark, sf)
      .select(col("lang"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
      .filter(length(col("t")) >= 3)
    val want = t
      .select(col("lang"), graft.Functions.char_ngrams(col("t"), 3).as(Seq("pos", "gram")))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = t
      .groupBy("lang").agg(graft.Functions.gram3_agg(col("t")).as("c"))
      .collect().flatMap { r =>
        r.getSeq[Long](1).zipWithIndex.collect {
          case (n, i) if n > 0 => (r.getString(0), gramOf(i)) -> n
        }
      }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("partition-invariant: 1 vs 13 partitions, identical arrays") {
    val t = Tables.documents(spark, sf)
      .select(col("lang"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
    def run(parts: Int) = t.repartition(parts)
      .groupBy("lang").agg(graft.Functions.gram3_agg(col("t")).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(1) === run(13))
  }

  test("trigrams touching an out-of-alphabet byte are skipped") {
    import spark.implicits._
    val got = Seq("ab#cd", "abcd").toDF("t")
      .agg(graft.Functions.gram3_agg(col("t")).as("c"))
      .collect()(0).getSeq[Long](0)
    def idx(g: String) = alpha.indexOf(g(0)) * 1369 + alpha.indexOf(g(1)) * 37 + alpha.indexOf(g(2))
    // "ab#cd" contributes nothing (every window crosses '#');
    // "abcd" contributes abc + bcd
    assert(got.sum === 2L)
    assert(got(idx("abc")) === 1L && got(idx("bcd")) === 1L)
  }
}
