package graft

import org.scalatest.funsuite.AnyFunSuite

class DedupQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("near-dup plans are bucketed joins — no cartesian product") {
    Seq("q18_minhash", "q19_simhash", "q20_simdup", "q21_ngram").foreach { q =>
      val plan = physicalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q plan has a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q plan has a nested-loop join:\n$plan")
    }
  }

  test("exact dedup keeps one representative per distinct text") {
    val docs = Tables.documents(spark, sf)
    val deduped = SparkEntry.queries("q15_dedup")(spark, sf)
    assert(deduped.count() === docs.select("text").distinct().count())
    // representative is the min doc_id of its group
    assert(deduped.filter("doc_id IS NULL").count() === 0)
  }

  test("minhash near-dup pairs are symmetric-free and above threshold") {
    val pairs = SparkEntry.queries("q18_minhash")(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(5 * r.getAs[Long]("inter") >= 3 * r.getAs[Long]("uni"))
    }
  }

  test("simhash signatures fit in 60 bits") {
    val sims = SparkEntry.queries("q19_simhash")(spark, sf).collect()
    assert(sims.nonEmpty)
    sims.foreach { r =>
      val s = r.getAs[Long]("simhash")
      assert(s >= 0 && s < (1L << 60))
    }
  }
}
