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

  test("incremental near-dup pairs are strictly cross-set (hist x batch)") {
    import org.apache.spark.sql.functions.col
    val pairs = SparkEntry.queries("q64_incneardup")(spark, sf)
    // no history-history or batch-batch pair can ever appear
    assert(pairs.filter(col("hist_doc") % 10 >= 8 || col("new_doc") % 10 < 8)
      .count() === 0)
    // the cross-set predicate only RESTRICTS q18's candidate space:
    // every q64 pair is a q18 pair (in canonical min/max orientation)
    import org.apache.spark.sql.functions.{greatest, least}
    val canon64 = pairs.select(
      least(col("hist_doc"), col("new_doc")).as("doc_a"),
      greatest(col("hist_doc"), col("new_doc")).as("doc_b"))
    val q18 = SparkEntry.queries("q18_minhash")(spark, sf).select("doc_a", "doc_b")
    assert(canon64.join(q18, Seq("doc_a", "doc_b"), "left_anti").count() === 0,
      "q64 produced a pair q18's full search does not contain")
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

  /** 45 pseudo-random bits for the simhash region outside band 0
    * (the shared splitmix64 kernel), shifted past the band-0 bits. */
  private def rem45(i: Long): Long =
    graft.functions.Bloom.mix(i) & ((1L << 45) - 1)

  test("simdup bucket guard: degenerate shared-band corpus stays collision-bound") {
    import spark.implicits._
    import graft.queries.DedupQueries
    // every doc shares band 0 (low 15 bits all zero) — ONE bucket of n
    // in band 0, the O(n²/32k) worst case the constant bucket count
    // cannot bound; remaining 45 bits are random
    val n = 2000
    val sim = (0 until n).map(i => (i.toLong, rem45(1000L + i) << 15))
      .toDF("doc_id", "simhash")
    val allPairs = n.toLong * (n - 1) / 2
    val candidates = DedupQueries.simdupCandidates(sim, maxBucket = 100L).count()
    assert(candidates * 20 < allPairs,
      s"sub-banding must cut the candidate budget (all-pairs=$allPairs, got $candidates)")
  }

  test("simdup bucket guard: sub-banding keeps 100% recall at hamming <= 3") {
    import spark.implicits._
    import graft.queries.DedupQueries
    // 300 (base, partner) pairs, all sharing band 0; partners differ in
    // 1 or 3 bits of the remaining 45 — every pair is a true near-dup
    // that the guarded path must still find
    val rows = (0 until 300).flatMap { k =>
      val base = rem45(k.toLong) << 15
      val flipped =
        if (k % 2 == 0) base ^ (1L << (15 + k % 45))
        else base ^ (1L << (15 + k % 45)) ^ (1L << (15 + (k + 13) % 45)) ^
          (1L << (15 + (k + 29) % 45))
      Seq((2L * k, base), (2L * k + 1, flipped))
    }
    val sim = rows.toDF("doc_id", "simhash")
    def run(maxBucket: Long) =
      DedupQueries.simdupNearDups(sim, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val guarded = run(50L) // band-0 bucket of 600 >> 50 → sub-banded
    val exact = run(Long.MaxValue) // guard never trips → plain banding
    assert(guarded === exact, "guard changed the RESULT, not just the plan")
    (0 until 300).foreach { k =>
      assert(guarded.exists(p => p._1 == 2L * k && p._2 == 2L * k + 1),
        s"planted near-dup pair ($k) lost by the guarded path")
    }
  }

  test("q245 bitmap filter bound: never below the true intersection (exhaustive sf0.001)") {
    import graft.queries.DedupQueries
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    // Re-derive every doc's shingle set + the 128-bit bucket bitmaps
    // exactly as prefixJoin builds them, then check the filter's
    // inequality  inter ≤ min(na − |bits(a)\bits(b)|, nb − |bits(b)\bits(a)|)
    // over ALL doc pairs (not just join candidates) — the completeness
    // proof as an exhaustive check on the small corpus. A single
    // violation would mean the filter can drop a qualifying pair.
    val m = DedupQueries.shingleSets(spark, sf).select(col("doc_id"),
      col("sset"), size(col("sset")).cast(LongType).as("nset"),
      expr("""aggregate(sset, 0L, (acc, t) ->
        acc | CASE WHEN pmod(xxhash64(t), 128) < 64
              THEN shiftleft(1L, cast(pmod(xxhash64(t), 128) as int))
              ELSE 0L END)""").as("bm0"),
      expr("""aggregate(sset, 0L, (acc, t) ->
        acc | CASE WHEN pmod(xxhash64(t), 128) >= 64
              THEN shiftleft(1L, cast(pmod(xxhash64(t), 128) as int) - 64)
              ELSE 0L END)""").as("bm1"))
    def missed(x: String, y: String) =
      bit_count(col(s"$x.bm0").bitwiseAND(bitwise_not(col(s"$y.bm0")))) +
        bit_count(col(s"$x.bm1").bitwiseAND(bitwise_not(col(s"$y.bm1"))))
    val viol = m.as("a").join(m.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        graft.Functions.sorted_intersect_count(col("a.sset"), col("b.sset")).as("inter"),
        least(col("a.nset") - missed("a", "b"),
          col("b.nset") - missed("b", "a")).as("ub"))
      .filter(col("inter") > col("ub"))
      .count()
    assert(viol === 0L, s"bitmap bound under-counted on $viol pairs")
  }

  test("q245 feasibility gate: refuses fast past the budget, quiet within it") {
    import graft.queries.DedupQueries
    // undersized budget → loud refusal naming the hot mass, the budget,
    // and the LSH alternative — the sf10 envelope as a fast error
    // instead of 15 minutes of GC death
    val ex = intercept[IllegalStateException] {
      DedupQueries.prefixJoin(spark, sf, budget = 1L)
    }
    assert(ex.getMessage.contains("refused")
      && ex.getMessage.contains("budget 1")
      && ex.getMessage.contains("q18_minhash"), ex.getMessage)
    // within budget the gate must not perturb the result (oracle
    // parity is the full check; this pins gated ≡ declared entry)
    val gated = DedupQueries.prefixJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val declared = SparkEntry.queries("q245_prefix_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated === declared)
  }
}
