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

  test("pair-budget invariant: bucket cardinality grows with plane count") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)

    def stats(nBits: Int): (Long, Long) = {
      val per = emb
        .select(graft.queries.SimilarityQueries.annBucket(col("embedding"), nBits).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"),
          sum(expr("n * (n - 1) div 2")).as("pairs"))
        .head()
      (per.getAs[Long]("buckets"), per.getAs[Long]("pairs"))
    }

    val (b4, pairs4) = stats(4)
    val (b12, pairs12) = stats(12)
    assert(b4 <= 16L)
    // more planes -> more, smaller buckets -> a collapsing pair budget;
    // this is what makes the near-dup join sub-quadratic at scale
    assert(b12 > b4 * 8)
    assert(pairs12 * 10 < pairs4,
      s"12-bit bucketing must cut candidate pairs >=10x (4-bit: $pairs4, 12-bit: $pairs12)")
  }

  test("multiprobe covers the bucket and its 1-bit neighbors") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val probes = Seq(5L).toDF("b")
      .select(graft.queries.SimilarityQueries.multiprobe(col("b"), 4).as("p"))
      .as[Seq[Long]].head()
    assert(probes === Seq(5L, 4L, 7L, 1L, 13L)) // b, b^1, b^2, b^4, b^8
    assert(probes.distinct.length === 5)
  }
}
