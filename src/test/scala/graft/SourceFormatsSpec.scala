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

  test("partitioned write prunes partitions at the scan (PartitionFilters)") {
    val dir = tmp("fmt-part") + "/events"
    base.write.partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"partition filter did not reach the scan:\n$plan")
    // only the purchase partition's rows are read (inputFiles lists
    // the whole relation, so pin the count + the pruned filter text)
    assert(df.count() ===
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
    assert(plan.contains("= purchase)"),
      s"purchase partition predicate not visible in scan:\n$plan")
  }

  test("runtime bloom filter auto-injects on a selective dim join") {
    // q52 builds its bloom prefilter explicitly; Spark's own
    // InjectRuntimeFilter should produce the same shape
    // automatically when enabled — pin that the session is capable
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = tmp("fmt-bloom") + "/events"
      base.write.parquet(dir)
      // the rule only injects when the application side already has a
      // shuffle to hide the filter behind — as any real aggregation/
      // repartition pipeline does
      val fact = spark.read.parquet(dir).repartition(col("event_id"))
      // creation side must be a SELECTIVE Filter(+Project) directly
      // over a scan — an Aggregate (distinct) disqualifies it
      val dim = spark.read.parquet(s"$sf/events.parquet")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("k"))
      val plan = fact.join(dim, col("event_id") === col("k"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter")
        || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
