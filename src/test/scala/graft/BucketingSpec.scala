package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** Bucketed co-located joins: same key, same bucket count ⇒ the join
  * plans with no Exchange on either side, and results match the
  * shuffled join exactly. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed doc tables join with zero exchange, same results") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val scores = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    try {
      Bucketing.writeBucketed(docs, "bspec_docs", "doc_id", 8)
      Bucketing.writeBucketed(scores, "bspec_scores", "doc_id", 8)
      val j = spark.table("bspec_docs")
        .join(spark.table("bspec_scores"), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val got = j.select(col("doc_id"), col("lang"), col("len"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      val want = docs.join(scores, "doc_id")
        .select(col("doc_id"), col("lang"), col("len"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got === want)
      assert(got.length === 500)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_docs")
      spark.sql("DROP TABLE IF EXISTS bspec_scores")
    }
  }

  test("bucketed snapshots full-outer join with zero exchange (q129's scale path)") {
    // the CDC diff's claim in code: two snapshot versions bucketed by
    // doc_id diff with NO shuffle, and the per-source status counts
    // equal the unbucketed q129 shape on the same slices
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source").as("src_o"),
        md5(col("text").cast("binary")).as("h_old"))
    val neu = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("source").as("src_n"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).cast("binary")).as("h_new"))
    def diff(o: org.apache.spark.sql.DataFrame, n: org.apache.spark.sql.DataFrame) =
      o.join(n, Seq("doc_id"), "full_outer")
        .select(coalesce(col("src_o"), col("src_n")).as("source"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("source", "status").agg(count(lit(1)).as("n"))
    try {
      Bucketing.writeBucketed(old, "bspec_snap_old", "doc_id", 8)
      Bucketing.writeBucketed(neu, "bspec_snap_new", "doc_id", 8)
      val j = diff(spark.table("bspec_snap_old"), spark.table("bspec_snap_new"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning") && l.contains("doc_id")),
        s"bucketed snapshot diff still shuffles the join keys:\n$plan")
      val got = j.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
      val want = diff(old, neu).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
      assert(got === want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_snap_old")
      spark.sql("DROP TABLE IF EXISTS bspec_snap_new")
    }
  }

  test("bucketed groupBy on the bucket key skips the aggregation exchange") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    try {
      Bucketing.writeBucketed(docs, "bspec_agg", "doc_id", 8)
      val a = spark.table("bspec_agg").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$plan")
      assert(a.count() === 500)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_agg")
    }
  }
}
