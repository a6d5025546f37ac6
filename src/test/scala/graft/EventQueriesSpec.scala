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

  test("q136 gap fill: full grid, zero-filled days, counts conserved") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q136_gapfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = rows.map(_._1).distinct.length
    val days = rows.map(_._2).distinct.length
    assert(rows.length == types * days, "grid is not complete")
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      (rows.map(_._2).min to rows.map(_._2).max).toSeq, "day spine has holes")
    assert(rows.map(_._3).sum == Tables.events(spark, sf).count())
    // zero-filled cells = grid cells minus observed (type, day) rows
    val observed = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct().count()
    assert(rows.count(_._3 == 0L).toLong == types.toLong * days - observed)
  }

  test("q138 covariance numerators match the gap-filled grid arithmetic") {
    import org.apache.spark.sql.functions._
    val grid = SparkEntry.queries("q136_gapfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = grid.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val got = SparkEntry.queries("q138_comovement")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val types = byType.keys.toSeq.sorted
    for (Seq(x, y) <- types.combinations(2)) {
      val (xs, ys) = (byType(x), byType(y))
      val m = xs.length.toLong
      val cov = m * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
      assert(got((x, y)) == ((m, cov, cov > 0)), s"pair ($x, $y)")
    }
  }

  test("q139 reach is monotone and ends at the distinct-user count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q139_reach")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum == rows.last._3)
    assert(rows.last._3 ==
      Tables.events(spark, sf).select(countDistinct(col("user_id"))).collect()(0).getLong(0))
    val reaches = rows.map(_._3)
    assert(reaches.zip(reaches.tail).forall { case (a, b) => a < b })
  }

  test("q137 interpolated quantiles match a driver-side type-7 computation") {
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    def q7(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (xs(lo + 1) - xs(lo)) * (pos - lo)
    }
    SparkEntry.queries("q137_quantile_cont")(spark, sf).collect().foreach { r =>
      val xs = vals(r.getString(0))
      assert(r.getLong(1) == xs.length.toLong)
      // same type-7 quantile up to the interpolation's last ulp (the
      // CROSS-ENGINE bit-parity is the oracle hash-match's job)
      assert(math.abs(r.getDouble(2) - q7(xs, 0.5)) < 1e-9, s"${r.getString(0)} median")
      assert(math.abs(r.getDouble(3) - q7(xs, 0.9)) < 1e-9, s"${r.getString(0)} p90")
    }
  }
}
