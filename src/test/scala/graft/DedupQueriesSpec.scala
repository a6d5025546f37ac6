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

  test("ngram block guard: a degenerate single-block corpus does not go quadratic") {
    import org.apache.spark.sql.functions._
    import graft.queries.DedupQueries
    // collapse every doc into ONE (lang, source) block — the natural-
    // corpus worst case the (lang, source) blocking key cannot bound
    val degenerate = Tables.documents(spark, sf)
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))

    val g2 = degenerate
      .select(col("doc_id"), col("lang"), col("source"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
      .filter(length(col("t")) >= 4)
      .select(col("doc_id"), col("lang"), col("source"),
        Functions.gram4_codes(col("t")).as("gs"))
      .withColumn("ng", size(col("gs")).cast("long"))
      .localCheckpoint()
    val n = g2.count()
    val allPairs = n * (n - 1) / 2

    // guard tripped (block of n > 10) -> LSH candidates, budget far
    // below quadratic
    val candidates = DedupQueries.ngramCandidates(g2, maxBlock = 10L).count()
    assert(candidates * 5 < allPairs,
      s"LSH fallback must cut the candidate budget (n=$n, all-pairs=$allPairs, got $candidates)")

    // precision is exact: guarded results are a subset of the exact
    // all-pairs result, and identical-text dups (all grams shared,
    // hence identical signatures) are always recalled
    val guarded = DedupQueries.ngramNearDups(degenerate, maxBlock = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupQueries.ngramNearDups(degenerate, maxBlock = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.subsetOf(exact))
    val identicalDups = degenerate.groupBy("text")
      .agg(collect_list("doc_id").as("ids")).filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i+2, size(ids)), b -> struct(least(a, b) AS x, greatest(a, b) AS y))))")))
      .select("col.x", "col.y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(identicalDups.subsetOf(guarded),
      s"identical-text pairs must survive the LSH fallback (${identicalDups.size} expected)")
  }
}
