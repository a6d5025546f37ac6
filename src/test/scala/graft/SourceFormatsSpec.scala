package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Batch source-format breadth: the engine's queries run off whatever
  * `spark.read` yields, so CSV and JSON copies of the events table
  * must reproduce the parquet rows exactly (schema applied explicitly
  * — schema inference is a scan the 100 TB path never pays). */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private val cols = Seq("event_id", "user_id", "event_type", "value", "ts_ns")

  private def base = Tables.events(spark, sf)
    .select(cols.map(col): _*)

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_ns", LongType)))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(cols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r.getLong(4)))
      .sortBy(t => (t._1, t._5))

  test("csv round-trip reproduces the parquet events exactly") {
    val dir = tmp("fmt-csv") + "/events"
    base.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(rows(back).sameElements(rows(base)))
  }

  test("json-lines round-trip reproduces the parquet events exactly") {
    val dir = tmp("fmt-json") + "/events"
    base.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(rows(back).sameElements(rows(base)))
  }

  test("orc round-trip reproduces the parquet events exactly") {
    val dir = tmp("fmt-orc") + "/events"
    base.write.orc(dir)
    val back = spark.read.schema(schema).orc(dir)
    assert(rows(back).sameElements(rows(base)))
  }

  test("orc scan pushes predicates and prunes columns like parquet") {
    val dir = tmp("fmt-orc-plan") + "/events"
    base.write.orc(dir)
    val plan = spark.read.orc(dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,purchase)"),
      s"ORC scan lost predicate pushdown:\n$plan")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("value") && !read.contains("ts_ns"),
      s"ORC scan reads unprojected columns:\n$read")
  }
}
