package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The persisted incremental near-dup history (q64's scale contract):
  * the band table is written once bucketed on the fused band key, and
  * a batch probe joins it with NO Exchange on the history side, with
  * results identical to the recompute-both-sides q64 query. */
class DedupHistorySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def walk(sp: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = sp match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      walk(a.executedPlan)
    case other => other +: other.children.flatMap(walk)
  }

  test("history probe joins the persisted band table with no Exchange on the history side; parity with q64") {
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      DedupQueries.writeNearDupHistory(spark, sf, "dhspec_hist", buckets = 8)
      // force the sort-merge path: at test SF everything fits a
      // broadcast, which would hide whether bucketing carries the
      // join at scale (where neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val inc = DedupQueries.incNearDupsAgainstHistory(spark, sf, "dhspec_hist")

      // STRUCTURAL pin: the join subtree that scans the bucketed
      // history table must contain no shuffle — the scan's bucket
      // layout IS the join distribution
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val root = inc.queryExecution.executedPlan
      val probeJoins = walk(root).collect {
        case j: BaseJoinExec if walk(j).exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == "dhspec_hist")
          case _ => false
        } => j
      }
      assert(probeJoins.nonEmpty, s"no join over the history scan:\n$root")
      // the innermost such join is the band probe itself
      val probe = probeJoins.last
      val histSide = Seq(probe.left, probe.right).find(side => walk(side).exists {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == "dhspec_hist")
        case _ => false
      }).get
      val shuffles = walk(histSide).collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"history side of the band probe shuffles:\n$root")
      val bucketedScan = walk(histSide).collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketedScan.nonEmpty, s"history scan is not bucketed:\n$root")

      // RESULT pin: identical rows to q64 (which recomputes both sides)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val got = rows(inc)
      val want = rows(SparkEntry.queries("q64_incneardup")(spark, sf))
      assert(got === want, s"history probe diverged from q64 (${got.length} vs ${want.length} rows)")
      assert(got.nonEmpty, "q64 parity check is vacuous — no near-dup pairs at this SF")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.sql("DROP TABLE IF EXISTS dhspec_hist")
    }
  }
}
