package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupArtifacts, DedupQueries}

/** The land-once/probe-many contract of the persisted dedup artifacts:
  * probing the bucketed pair/label tables must be EXACTLY the relation
  * the live kernel computes (else every consumer query silently forks
  * from q18/q51 semantics), and the label probe must ride the bucket
  * layout with no exchange on the artifact side (else the "persisted"
  * table still pays a corpus shuffle per consumer at 100 TB). */
class DedupArtifactsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "inter", "uni").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("pairs probe ≡ live kernel, row for row") {
    val live = pairSet(DedupQueries.minhashNearDupPairs(spark, sf))
    val probe = pairSet(DedupArtifacts.pairs(spark, sf))
    assert(live === probe,
      s"extra=${probe -- live} missing=${live -- probe}")
  }

  test("labels probe ≡ live CC labeling with singleton fallback and min-id keep") {
    val pairs = DedupQueries.minhashNearDupPairs(spark, sf)
      .select("doc_a", "doc_b")
    val cc = graft.ops.ConnectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    val live = Tables.documents(spark, sf).select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", (col("cluster_id") === col("doc_id"))
        .cast(org.apache.spark.sql.types.LongType))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probe = DedupArtifacts.labels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(live === probe, s"extra=${probe -- live} missing=${live -- probe}")
    // exactly one kept representative per cluster, and it's the min id
    val perCluster = probe.groupBy(_._2)
    perCluster.foreach { case (cid, members) =>
      val kept = members.filter(_._3 == 1L)
      assert(kept.size == 1 && kept.head._1 == members.map(_._1).min
        && cid == members.map(_._1).min,
        s"cluster $cid keeps ${kept.map(_._1)} of ${members.map(_._1)}")
    }
  }

  test("both artifact tables are bucketed + sorted on their probe keys") {
    def spec(table: String): Map[String, String] =
      spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    DedupArtifacts.labels(spark, sf) // ensure landed
    val p = spec(DedupArtifacts.pairsTable(sf))
    assert(p("Num Buckets") === DedupArtifacts.Buckets.toString)
    assert(p("Bucket Columns") === "[`doc_a`]" && p("Sort Columns") === "[`doc_a`]")
    val l = spec(DedupArtifacts.labelsTable(sf))
    assert(l("Num Buckets") === DedupArtifacts.Buckets.toString)
    assert(l("Bucket Columns") === "[`doc_id`]" && l("Sort Columns") === "[`doc_id`]")
  }

  private def walk(sp: SparkPlan): Seq[SparkPlan] = sp match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case other => other +: other.children.flatMap(walk)
  }

  test("a doc_id join against the labels table plans no exchange on the artifact side") {
    // the 100 TB point of the bucket layout: consumers hash THEIR side
    // to the label buckets; the label table never moves again
    val labels = DedupArtifacts.labels(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
    // hint on the ARTIFACT side: forces the exchange-visible merge-join
    // form (at spec scale the table would otherwise broadcast and the
    // assertion would pass vacuously)
    val joined = docs.join(
      labels.select("doc_id", "cluster_id").hint("merge"), Seq("doc_id"))
    val root = joined.queryExecution.executedPlan
    val shufflesOverLabels = walk(root).collect {
      case ex: ShuffleExchangeExec
        if walk(ex).exists(_.toString.contains(DedupArtifacts.labelsTable(sf))) => ex
    }
    assert(shufflesOverLabels.isEmpty,
      s"label artifact crossed an exchange:\n$root")
  }
}
