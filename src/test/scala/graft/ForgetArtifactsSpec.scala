package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, KMeans}
import graft.queries.DedupQueries

/** Deletion lifecycle on the PERSISTED artifacts (the q262 story
  * continued past the label table): merge-on-read tombstones must hide
  * deleted rows immediately, and compaction must fold them in without
  * touching what it doesn't have to — partition-pruned for the IVF
  * index, full-rewrite-by-design (amortized) for the band history. */
class ForgetArtifactsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def qemb = Tables.embeddings(spark, sf)
    .filter(!exists(col("embedding"), _.isNull))
    .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))

  private def listFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    if (!d.exists) Map.empty
    else d.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap
  }

  test("IVF delete masks immediately; compact rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfforget").toString
    try {
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      IvfIndex.write(qemb, model, dir)

      val byCid = qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      // wipe one whole partition, nibble one vector from another,
      // leave a third untouched
      val cids = byCid.keys.toSeq.sorted
      assert(cids.size >= 3, "need >=3 populated partitions for this test")
      val (wiped, nibbled, untouched) = (cids(0), cids(1), cids(2))
      val dead = byCid(wiped) + byCid(nibbled).head
      val untouchedFiles = listFiles(s"$dir/cid=$untouched")
      assert(untouchedFiles.nonEmpty)

      IvfIndex.delete(spark, dir, dead.toSeq)
      // merge-on-read: every probe hides the dead set with no rewrite
      val probed = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val live = byCid.values.flatten.toSet -- dead
      assert(probed === live, "tombstoned vectors leaked through the probe")

      IvfIndex.compact(spark, dir)
      // tombstones consumed; probe parity holds post-compaction
      assert(IvfIndex.tombstones(spark, dir).isEmpty)
      val after = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(after === live, "compaction changed the visible row set")
      // partition-pruned copy-on-write: the untouched partition's
      // files are byte-identical, the wiped partition is gone
      assert(listFiles(s"$dir/cid=$untouched") === untouchedFiles,
        "compaction rewrote a partition with no tombstones")
      assert(!new java.io.File(s"$dir/cid=$wiped").exists,
        "fully-tombstoned partition should be dropped")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("applyForget \u2261 full rebuild on the filtered corpus \u2014 bridge deletion splits the cluster") {
    import graft.queries.DedupArtifacts
    // union-find for the client-side reference rebuild
    def components(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        if (nodes(a) && nodes(b)) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      nodes.map(n => n -> find(n)).toMap
    }
    // Deterministic chain fixture: three docs that are SLIDING WINDOWS
    // of one 30-word sequence. With 3-word shingles, windows at word
    // offsets 0/4/8 (22 words each -> 20 shingles {1..20}/{5..24}/
    // {9..28}) give J(A,B) = J(B,C) = 16/24 = 0.67 >= 0.6 but
    // J(A,C) = 12/28 = 0.43 < 0.6 \u2014 a guaranteed A\u2013B\u2013C chain whose
    // middle doc is a bridge. Three chains over disjoint vocabularies
    // hedge LSH banding luck (a pair whose bands all miss never enters
    // the artifact); the test uses the first chain the kernel fully
    // confirmed. Plus filler singletons so the corpus isn't all-dup.
    val tmp = java.nio.file.Files.createTempDirectory("forgetapply").toString
    val s2 = spark
    import s2.implicits._
    val rows = (0 until 3).flatMap { c =>
      val base = (0 until 30).map(w => s"chain${c}word$w")
      (0 until 3).map { k =>
        val id = (c * 3 + k + 1).toLong
        val text = base.slice(4 * k, 4 * k + 22).mkString(" ")
        (id, text, "en", s"src$c", text.length.toLong)
      }
    } ++ (100L until 110L).map(i =>
      (i, (0 until 25).map(w => s"solo${i}w$w").mkString(" "), "en", "solo", 25L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dir = tmp
    try {
      val pairsBefore = DedupArtifacts.pairs(spark, dir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // a usable chain: both rungs confirmed, no direct A\u2013C edge
      val bridge = (0 until 3).map(c => (3 * c + 1).toLong).collectFirst {
        case a if pairsBefore.contains((a, a + 1)) &&
          pairsBefore.contains((a + 1, a + 2)) &&
          !pairsBefore.contains((a, a + 2)) => a + 1
      }.getOrElse(fail(s"no intact chain in the fixture pair set: $pairsBefore"))
      val docs = rows.map(_._1).toSet
      DedupArtifacts.applyForget(spark, dir, Seq(bridge).toDF("doc_id"))

      // reference rebuild: union-find over the corpus minus the bridge
      val liveDocs = docs - bridge
      val liveEdges = pairsBefore.filterNot(p => p._1 == bridge || p._2 == bridge)
      val comp = components(liveDocs, liveEdges)
      val want = liveDocs.map(n => (n, comp(n), if (comp(n) == n) 1L else 0L))
      val got = spark.table(DedupArtifacts.labelsTable(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, "applyForget labels diverge from the filtered-corpus rebuild")
      // the split REALLY happened: the bridge's neighbors now sit in
      // two different clusters, each its own canonical
      val gotMap = got.map(t => t._1 -> t._2).toMap
      assert(gotMap(bridge - 1) !== gotMap(bridge + 1),
        s"deleting bridge $bridge did not split its chain")
      // pairs artifact: survivors only
      val pairsAfter = spark.table(DedupArtifacts.pairsTable(dir))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsAfter === liveEdges.toSet)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${DedupArtifacts.pairsTable(dir)}")
      spark.sql(s"DROP TABLE IF EXISTS ${DedupArtifacts.labelsTable(dir)}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("applyNewPairs merges clusters with bounded recompute and stays idempotent") {
    import graft.queries.DedupArtifacts
    // corpus: two twin-pairs over disjoint vocabularies -> clusters
    // {1,2} and {11,12} (offsets 0/1 of a 23-word run: J = 19/21),
    // plus singletons. A late cross-modality pair (2, 11) must merge
    // the two clusters under min-id and leave the singletons verbatim.
    val tmp = java.nio.file.Files.createTempDirectory("mergepairs").toString
    val s2 = spark
    import s2.implicits._
    def twin(vocab: String, ids: Seq[Long]) = {
      val base = (0 until 23).map(w => s"$vocab$w")
      ids.zipWithIndex.map { case (id, k) =>
        val text = base.slice(k, k + 22).mkString(" ")
        (id, text, "en", vocab, text.length.toLong)
      }
    }
    val rows = twin("alpha", Seq(1L, 2L)) ++ twin("beta", Seq(11L, 12L)) ++
      (100L until 106L).map(i =>
        (i, (0 until 25).map(w => s"solo${i}w$w").mkString(" "), "en", "solo", 25L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val before = DedupArtifacts.labels(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val bmap = before.map(t => t._1 -> t._2).toMap
      assert(bmap(2L) === 1L && bmap(12L) === 11L,
        s"fixture twins did not cluster as expected: $before")

      DedupArtifacts.applyNewPairs(spark, tmp,
        Seq((2L, 11L, 5L, 20L)).toDF("doc_a", "doc_b", "inter", "uni"))
      val after = spark.table(DedupArtifacts.labelsTable(tmp))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val amap = after.map(t => t._1 -> t._2).toMap
      // the two clusters merged to the global min id; canonicals moved
      Seq(1L, 2L, 11L, 12L).foreach(id => assert(amap(id) === 1L))
      assert(after.contains((1L, 1L, 1L)) && after.contains((11L, 1L, 0L)),
        "keep flags must re-elect exactly the merged cluster's min id")
      // untouched rows (singletons) are verbatim
      assert(after.filter(_._1 >= 100L) === before.filter(_._1 >= 100L))
      // the new edge landed in the pair table
      val pairKeys = spark.table(DedupArtifacts.pairsTable(tmp))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairKeys.contains((2L, 11L)))

      // idempotent: folding the same pair again changes nothing
      DedupArtifacts.applyNewPairs(spark, tmp,
        Seq((11L, 2L, 5L, 20L)).toDF("doc_a", "doc_b", "inter", "uni"))
      val again = spark.table(DedupArtifacts.labelsTable(tmp))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(again === after)

      // unknown endpoints refuse loudly instead of desyncing the tables
      intercept[IllegalArgumentException] {
        DedupArtifacts.applyNewPairs(spark, tmp,
          Seq((2L, 999L, 5L, 20L)).toDF("doc_a", "doc_b", "inter", "uni"))
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${DedupArtifacts.pairsTable(tmp)}")
      spark.sql(s"DROP TABLE IF EXISTS ${DedupArtifacts.labelsTable(tmp)}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("history tombstones mask probes immediately; compaction folds them in") {
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "faspec_hist", buckets = 8)
      val base = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(base.nonEmpty, "no near-dup pairs at this SF — test is vacuous")

      // forget one matched history doc; every pair it anchored must go
      val deadDoc = base.head._1
      val want = base.filterNot(_._1 == deadDoc)
      import spark.implicits._
      DedupQueries.tombNearDupHistory(spark, "faspec_hist",
        Seq(deadDoc).toDF("doc_id"))
      val masked = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(masked === want, "merge-on-read mask diverged from the filtered pair set")

      val rowsBefore = spark.table("faspec_hist").count()
      DedupQueries.compactNearDupHistory(spark, "faspec_hist", buckets = 8)
      // the side table persists (so a tombstone landing DURING compaction
      // stays pending — see the concurrency test) but the consumed
      // tombstones are gone
      assert(spark.table("faspec_hist_tombs").isEmpty,
        "compaction must consume the pending tombstones")
      // the doc's 6 band rows left the table; probe output is unchanged
      assert(spark.table("faspec_hist").count() === rowsBefore - 6)
      val after = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_hist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(after === want, "compaction changed the probe result")
    } finally {
      spark.sql("DROP TABLE IF EXISTS faspec_hist")
      spark.sql("DROP TABLE IF EXISTS faspec_hist_tombs")
    }
  }

  test("IVF delete landing DURING compaction stays pending and keeps masking") {
    val dir = java.nio.file.Files.createTempDirectory("ivfrace").toString
    try {
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      IvfIndex.write(qemb, model, dir)
      val byCid = qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val cids = byCid.map(_._2).distinct.sorted.toSeq
      val all = byCid.map(_._1).toSet
      val sortedIds = byCid.map(_._1).sorted
      val (vecA, vecB) = (sortedIds(0), sortedIds(1))

      IvfIndex.delete(spark, dir, Seq(vecA))
      // the "concurrent" delete: lands between the compaction's
      // tombstone-file snapshot and its consumption
      IvfIndex.afterSnapshotHook = Some(p =>
        if (p == dir) IvfIndex.delete(spark, dir, Seq(vecB)))
      try IvfIndex.compact(spark, dir)
      finally IvfIndex.afterSnapshotHook = None

      // vecA is consumed (physically gone); vecB must NOT have been
      // discarded unapplied — it stays pending and probes keep masking
      val pending = IvfIndex.tombstones(spark, dir)
        .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
      assert(pending === Set(vecB),
        s"the late-arriving tombstone must survive compaction: $pending")
      val probed = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(probed === all - vecA - vecB,
        "both deletions must stay invisible after the raced compaction")

      // the next scheduled compaction consumes the pending one
      IvfIndex.compact(spark, dir)
      assert(IvfIndex.tombstones(spark, dir).isEmpty)
      val finalProbe = IvfIndex.probe(spark, dir, cids)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(finalProbe === all - vecA - vecB)
    } finally {
      IvfIndex.afterSnapshotHook = None
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("history tombstone landing DURING compaction stays pending and keeps masking") {
    val s2 = spark
    import s2.implicits._
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "faspec_race", buckets = 8)
      val base = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_race")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val histDocs = base.map(_._1).distinct
      assert(histDocs.size >= 2, "need two matched history docs for the race test")
      val (docA, docB) = (histDocs(0), histDocs(1))

      DedupQueries.tombNearDupHistory(spark, "faspec_race", Seq(docA).toDF("doc_id"))
      DedupQueries.afterSnapshotHook = Some(t =>
        if (t == "faspec_race")
          DedupQueries.tombNearDupHistory(spark, "faspec_race", Seq(docB).toDF("doc_id")))
      try DedupQueries.compactNearDupHistory(spark, "faspec_race", buckets = 8)
      finally DedupQueries.afterSnapshotHook = None

      val pending = spark.table("faspec_race_tombs")
        .collect().map(_.getLong(0)).toSet
      assert(pending === Set(docB),
        s"the late-arriving tombstone must survive compaction: $pending")
      val masked = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_race")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(masked === base.filterNot(p => p._1 == docA || p._1 == docB),
        "both deletions must stay invisible after the raced compaction")

      DedupQueries.compactNearDupHistory(spark, "faspec_race", buckets = 8)
      assert(spark.table("faspec_race_tombs").isEmpty)
      val after = DedupQueries.incNearDupsAgainstHistory(spark, sf, "faspec_race")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(after === base.filterNot(p => p._1 == docA || p._1 == docB))
    } finally {
      DedupQueries.afterSnapshotHook = None
      spark.sql("DROP TABLE IF EXISTS faspec_race")
      spark.sql("DROP TABLE IF EXISTS faspec_race_tombs")
    }
  }
}
