package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** The native as-of join (custom LogicalPlan → Strategy → Exec):
  * result parity with brute force and with the window-composed
  * DataFrame form, null extension, determinism under co-partitioning,
  * and the plan shape (one key exchange + (key, time) sort per side
  * feeding AsOfJoinExec). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def randomSides(seed: Int, nl: Int, nr: Int) = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    val l = (0 until nl).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // unique (k, t) on the right for a deterministic pick
    val r = (0 until nr).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("rk", "rt0", "rid0")
      .groupBy("rk", "rt0").agg(max(col("rid0")).as("rid"))
      .withColumnRenamed("rt0", "rt")
    (l, r)
  }

  test("matches brute force on random keyed time series") {
    val (l, r) = randomSides(42, 500, 300)
    val got = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toSet
    // brute force: max-rt right row with rt <= t per left row, rid
    // tie-broken by construction (unique (rk, rt))
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = l.collect().map { x =>
      val (k, t, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rRows.filter(c => c._1 == k && c._2 <= t)
      val rid = if (cands.isEmpty) -1L else cands.maxBy(c => (c._2, c._3))._3
      (lid, rid)
    }.toSet
    assert(got.size === l.count())
    assert(got === want)
  }

  test("NULL key/time: null left rows null-extend, null right rows never match") {
    import spark.implicits._
    // left: one live row per key 0/1, plus a null-key and a null-time row
    val l = Seq[(java.lang.Long, java.lang.Long, Long)](
      (0L, 10L, 1L), (1L, 10L, 2L), (null, 10L, 3L), (0L, null, 4L))
      .toDF("k", "t", "lid")
    // right: key-0/time-0 bait (a null unboxed to 0L would steal it),
    // a real key-1 candidate, and null-key/null-time rows that must
    // never surface as matches
    val r = Seq[(java.lang.Long, java.lang.Long, Long)](
      (0L, 0L, 10L), (1L, 5L, 11L), (null, 1L, 12L), (1L, null, 13L))
      .toDF("rk", "rt", "rid")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toMap
    assert(got === Map(1L -> 10L, 2L -> 11L, 3L -> -1L, 4L -> -1L))
    // forward mode: same null discipline
    val fwd = AsOf.join(l, r, "k", "rk", "t", "rt", forward = true)
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toMap
    assert(fwd(3L) === -1L && fwd(4L) === -1L)
  }

  test("forward mode matches brute force (first right row at or after)") {
    val (l, r) = randomSides(99, 500, 300)
    val got = AsOf.join(l, r, "k", "rk", "t", "rt", forward = true)
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toSet
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = l.collect().map { x =>
      val (k, t, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rRows.filter(c => c._1 == k && c._2 >= t)
      val rid = if (cands.isEmpty) -1L else cands.minBy(c => (c._2, -c._3))._3
      (lid, rid)
    }.toSet
    assert(got === want)
    assert(want.exists(_._2 == -1L), "no null-extended forward rows — weak fixture")
  }

  test("equals the window-composed as-of form on real events") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ns"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu"), col("ts_ns").as("cts"))
      .agg(max(col("event_id")).as("click_id"))
    val native = AsOf.join(purchases, clicks, "user_id", "cu", "ts_ns", "cts")
      .select(col("event_id"), col("click_id"))

    // composed form: union-tag, per-user window carrying the last
    // click forward (the q42 contortion the native operator replaces)
    import org.apache.spark.sql.expressions.Window
    val tagged = purchases.select(col("user_id"), col("ts_ns"),
        col("event_id"), lit(null).cast("long").as("cid"), lit(1).as("isP"))
      .unionAll(clicks.select(col("cu"), col("cts"), lit(null).cast("long"),
        col("click_id"), lit(0)))
    val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("isP"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("lastc", last(col("cid"), ignoreNulls = true).over(w))
      .filter(col("isP") === 1)
      .select(col("event_id"), col("lastc").as("click_id"))

    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native as-of diverged from the composed window form")
    assert(native.filter(col("click_id").isNull).count() > 0,
      "no null-extended rows — weak fixture")
  }

  test("SQL metrics: output rows = left rows, matched counted") {
    val (l, r) = randomSides(5, 300, 200)
    val df = AsOf.join(l, r, "k", "rk", "t", "rt")
    // drive df's OWN queryExecution (write would spawn a fresh one
    // whose metrics we couldn't reach)
    assert(df.queryExecution.executedPlan.execute().count() === 300L)
    // pull the exec's metrics out of the executed adaptive plan
    def findExec(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findExec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findExec(q.plan) // stages hide their subtree from children
      case e: graft.plans.AsOfJoinExec => Some(e)
      case other => other.children.flatMap(findExec).headOption
    }
    val exec = findExec(df.queryExecution.executedPlan)
    assert(exec.nonEmpty, "AsOfJoinExec not found in executed plan")
    assert(exec.get.metrics("numOutputRows").value === 300L)
    val matched = exec.get.metrics("numMatched").value
    assert(matched > 0 && matched <= 300L)
  }

  test("plan: AsOfJoinExec fed by one key exchange + (key, time) sort per side") {
    val (l, r) = randomSides(7, 100, 100)
    val plan = AsOf.join(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) >= 2,
      s"expected a key exchange per side:\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort [")) >= 2,
      s"expected a (key, time) sort per side:\n$plan")
  }
}
