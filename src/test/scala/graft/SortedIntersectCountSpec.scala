package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SortedIntersectCountSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("matches size(array_intersect) on random sorted deduped arrays") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    def randSet(): Seq[String] =
      Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toString).distinct.sorted
    val cases = Seq.fill(200)((randSet(), randSet())) ++
      Seq((Seq.empty[String], Seq("a")), (Seq.empty[String], Seq.empty[String]),
        (Seq("a", "b"), Seq("a", "b")))
    val df = cases.toDF("a", "b")
    val bad = df.select(
        Functions.sorted_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("SQL registration and null propagation") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
    assert(r.collect()(0).getLong(0) === 2)
    val n = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<STRING>), array('a')) AS n")
    assert(n.collect()(0).isNullAt(0))
  }
}
