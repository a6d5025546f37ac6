package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilarityQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q16 top-k compiles to distributed partial top-k, not a global sort") {
    val plan = SparkEntry.queries("q16_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("query vector is broadcast in q16/q22 (no shuffle of the corpus)") {
    Seq("q16_topk", "q22_ann").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("Broadcast"), s"$q should broadcast the 1-row query side:\n$plan")
    }
  }

  test("q22 ANN searches a strict subset of the corpus") {
    val all = Tables.embeddings(spark, sf).count()
    val spark2 = spark
    import spark2.implicits._
    val ann = SparkEntry.queries("q22_ann")(spark, sf).as[(Long, Double)].collect()
    assert(ann.length === 10)
    // results sorted desc by sim
    assert(ann.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(all === 500)
  }

  test("q23 near-dup pairs are ordered and above threshold") {
    val rows = SparkEntry.queries("q23_embdup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("sim") >= 0.4)
    }
  }
}
