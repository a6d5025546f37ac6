package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DistributedRank

/** DistributedRank must equal the plain per-group row_number window
  * exactly — same ranks, every row, under value ties (broken by id)
  * and group skew — while never collapsing the frame onto |groups|
  * tasks. */
class DistributedRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rank parity with the window form under ties and skew") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    // 3 groups with 10:3:1 skew; values drawn from a SMALL domain so
    // cross-partition ties are guaranteed
    val rows = (0 until 20000).map { i =>
      val g = rnd.nextInt(14) match {
        case x if x < 10 => "a"
        case x if x < 13 => "b"
        case _ => "c"
      }
      (g, i.toLong, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("g", "id", "v").repartition(13)
    val got = DistributedRank.rowNumber(df, "r", Seq("g"),
      Seq(col("v"), col("id")), parts = 8)
    val want = df.withColumn("r",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")))
    assert(got.select("g", "id", "r").exceptAll(want.select("g", "id", "r")).isEmpty,
      "distributed ranks diverge from window ranks")
    assert(got.count() === 20000)
  }

  test("plan: the corpus window partitions by (pid, group), not group alone") {
    val s2 = spark
    import s2.implicits._
    val df = (0 until 1000).map(i => ("t", i.toLong, (i % 7).toDouble))
      .toDF("g", "id", "v")
    val plan = DistributedRank.rowNumber(df, "r", Seq("g"),
      Seq(col("v"), col("id")), parts = 8)
      .queryExecution.executedPlan.toString
    // the big window's partition spec must include __pid — a window
    // keyed on g alone would re-create the |groups|-task collapse
    assert(plan.contains("__pid"), s"no __pid in plan:\n$plan")
    val bad = "windowspecdefinition\\(g#".r
    assert(!plan.toLowerCase.contains("windowspecdefinition(g#") ||
      plan.toLowerCase.contains("__pid"),
      s"corpus window keyed on group alone:\n$plan")
  }
}
