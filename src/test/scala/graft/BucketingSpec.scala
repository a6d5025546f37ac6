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
