package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.EnvelopeSchema
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    assert(EnvelopeSchema.compatible(media.schema, Multimodal.mediaSchema),
      s"schema drift: ${media.schema}")
    val r = media.head()
    assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
  }

  test("feature histogram sums to payload length") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val feat = Multimodal.extractFeatures(spark, media)
    val joined = feat.join(media, "media_id")
      .select(col("media_id"),
        expr("aggregate(features, 0L, (a, x) -> a + x)").as("hist_total"),
        length(col("bytes")).cast("long").as("n_bytes"))
    assert(joined.filter(col("hist_total") =!= col("n_bytes")).count() === 0)
  }

  test("frame sampling covers every byte exactly once") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(spark, media, 256)
    val covered = frames.groupBy("media_id")
      .agg(sum("len").as("covered"), count(lit(1)).as("n_frames"))
    val expect = media.filter("kind = 'video'")
      .select(col("media_id"), length(col("bytes")).cast("long").as("n_bytes"))
    assert(covered.join(expect, "media_id")
      .filter(col("covered") =!= col("n_bytes")).count() === 0)
    // every frame except possibly the last is full-size
    assert(frames.filter("len > 256 OR len <= 0").count() === 0)
  }

  test("resize truncates payload and clamps dimensions") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val resized = Multimodal.resize(media, 128)
    assert(resized.filter(length(col("bytes")) > 128).count() === 0)
    assert(resized.filter(col("meta.width") > 64 || col("meta.height") > 64).count() === 0)
    assert(EnvelopeSchema.compatible(resized.schema, Multimodal.mediaSchema))
  }

  test("extraction plan is a narrow mapPartitions (no shuffle)") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("energy segmentation: windows, voiced count, run count, partial-window drop") {
    import spark.implicits._
    // 4-byte windows, bar 30000: V V S V S S V + 2 trailing bytes
    // (partial window, dropped) → 7 windows, 4 voiced, 3 segments
    val hi = Array.fill[Byte](4)(90) // 90²·4 = 32400 ≥ 30000
    val lo = Array.fill[Byte](4)(10) // 10²·4 = 400
    val payload = hi ++ hi ++ lo ++ hi ++ lo ++ lo ++ hi ++ Array[Byte](5, 5)
    val media = Seq(
      (1L, "audio", payload),
      (2L, "video", payload), // wrong kind: excluded
      (4L, "audio", Array[Byte](1, 2)) // shorter than one window
    ).toDF("media_id", "kind", "bytes")
    val out = Multimodal.energySegments(spark, media, window = 4, threshold = 30000L)
      .orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 7L, 4L, 3L), (4L, 0L, 0L, 0L)))
  }

  test("q140: pairs pass the integer cosine gate; exact content dupes are caught") {
    val rows = SparkEntry.queries("q140_media_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (mx, my, dot, na, nb) =>
      assert(mx < my)
      assert(dot > 0 && dot * dot * 100000000L >= 99980001L * na * nb)
    }
    // exact text duplicates have identical histograms (cos = 1): every
    // q15 duplicate pair must surface as a media near-dup
    val dupPairs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => r.getString(1) -> r.getLong(0)).groupBy(_._1)
      .values.filter(_.length > 1)
      .flatMap(g => g.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val found = rows.map(t => (t._1, t._2)).toSet
    // sf0.001 may hold no exact dupes; when it does, all must surface
    assert(dupPairs.subsetOf(found),
      s"exact dupes missing from media near-dups: ${dupPairs -- found}")
    // identical-histogram pairs (cos = 1 exactly) must exist regardless
    assert(rows.exists { case (_, _, dot, na, nb) => dot * dot == na * nb })
  }

  test("q140: dupes-subset invariant holds at two signature widths") {
    // exact content dupes have identical histograms, hence identical
    // quantized vectors: they share every ladder cut AND the hash
    // refinement key, so they must surface at ANY sigBits width — the
    // width dial (and the pair-budget guard behind it) trades away
    // only near-misses, never exact dupes
    val dupPairs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => r.getString(1) -> r.getLong(0)).groupBy(_._1)
      .values.filter(_.length > 1)
      .flatMap(g => g.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(dupPairs.nonEmpty || sf.endsWith("sf0.001"), "want dupes at larger sf")
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(spark, media)
    val at4 = graft.queries.MultimodalQueries.mediaNearDups(feats, sigBits = 4)
      .select("mx", "my").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at8Rows = graft.queries.MultimodalQueries.mediaNearDups(feats, sigBits = 8)
      .select("mx", "my", "dot", "na", "nb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val at8 = at8Rows.map(t => (t._1, t._2)).toSet
    assert(dupPairs.subsetOf(at4), s"dupes missing at width 4: ${dupPairs -- at4}")
    assert(dupPairs.subsetOf(at8), s"dupes missing at width 8: ${dupPairs -- at8}")
    // the narrowing guarantee is STRUCTURAL only for identical-histogram
    // pairs (cos = 1 ⟺ dot² = na·nb ⟹ identical q8 ⟹ equal refinement
    // keys at every depth): a confirmed near-miss with unequal q8 can
    // legally flip sub-buckets between widths when the budget guard's
    // masks differ, so containment is asserted on the cos = 1 pairs,
    // not the full candidate sets (which today happen to coincide)
    val identAt8 = at8Rows.collect {
      case (mx, my, dot, na, nb) if dot * dot == na * nb => (mx, my)
    }.toSet
    assert(identAt8.subsetOf(at4),
      s"width-8 identical-histogram pairs missing at width 4: ${identAt8 -- at4}")
  }
}
