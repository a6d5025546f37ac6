package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}

class EventQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("q06 counts all five event types, q07 consume == table size") {
    val total = Tables.events(spark, sf).count()
    val types = SparkEntry.queries("q06_type_counts")(spark, sf).count()
    assert(types == 5)
    val row = SparkEntry.queries("q07_counters")(spark, sf).collect().head
    assert(row.getAs[Long]("consume") == total)
    assert(row.getAs[Long]("forwarded") + row.getAs[Long]("ignored") == total)
  }

  test("routing drops only unroutable types (O5 drop rule)") {
    val e = Tables.events(spark, sf)
    val routed = SparkEntry.queries("q02_route")(spark, sf)
    assert(!routed.schema("topic").nullable || routed.filter("topic IS NULL").count() == 0)
    val errN = e.filter("event_type = 'error'").count()
    val keptN = e.select(
      graft.queries.EventQueries.topicExpr(
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id")).as("topic"))
      .filter("topic IS NOT NULL").count()
    assert(keptN == e.count() - errN)
  }

  test("flagship entry returns routed+encoded rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("event_id", "topic", "payload"))
  }
}
