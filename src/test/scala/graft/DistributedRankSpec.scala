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

  test("edges: fewer rows than partitions, one group, empty group spec") {
    val s2 = spark
    import s2.implicits._
    // 3 rows across 8 requested partitions — offsets must still chain
    val tiny = Seq(("g", 1L, 2.0), ("g", 2L, 1.0), ("g", 3L, 1.0))
      .toDF("g", "id", "v")
    val r = DistributedRank.rowNumber(tiny, "r", Seq("g"),
      Seq(col("v"), col("id")), parts = 8)
      .orderBy("r").select("id").as[Long].collect().toSeq
    assert(r === Seq(2L, 3L, 1L)) // v asc, id tiebreak
    // empty group spec = one global ranking
    val glob = DistributedRank.rowNumber(tiny, "r", Seq.empty,
      Seq(col("v").desc, col("id")), parts = 4)
      .orderBy("r").select("id").as[Long].collect().toSeq
    assert(glob === Seq(1L, 2L, 3L))
    // empty input survives
    assert(DistributedRank.rowNumber(tiny.filter(lit(false)), "r",
      Seq("g"), Seq(col("v"), col("id"))).count() === 0L)
  }

  test("plan: the corpus window partitions by (pid, group), not group alone") {
    val s2 = spark
    import s2.implicits._
    val df = (0 until 1000).map(i => ("t", i.toLong, (i % 7).toDouble))
      .toDF("g", "id", "v")
    val plan = DistributedRank.rowNumber(df, "r", Seq("g"),
      Seq(col("v"), col("id")), parts = 8)
      .queryExecution.executedPlan.toString
    // EVERY window spec in the plan must involve __pid — the corpus
    // window partitions by (__pid, g); the tiny offsets window orders
    // by __pid. A window spec mentioning g but not __pid anywhere is
    // exactly the |groups|-task collapse this helper exists to avoid.
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(plan).map { m =>
      val tail = plan.substring(m.end)
      tail.take(math.max(0, tail.indexOf("specifiedwindowframe")))
    }.toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$plan")
    specs.foreach { spec =>
      assert(spec.contains("__pid"),
        s"window spec without __pid (group-alone collapse): $spec\n$plan")
    }
  }
}
