package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion propagation (q262_forget) and its packed-artifact blast
  * radius (q263_repack_plan): cross-consistency against the artifacts
  * they derive from (q51 labels, q80 packs) and the tombstone-gate
  * invariants the queries promise. */
class ForgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val gate =
    "pmod(cast(conv(substring(md5(concat('tomb:', cast(doc_id as string))), " +
      "1, 15), 16, 10) as bigint), 50) = 0"

  test("q262 covers exactly the clusters holding a tombstone, with consistent sizes") {
    val out = SparkEntry.queries("q262_forget")(spark, sf).collect()
    assert(out.nonEmpty, "the tomb gate hits 10 docs at this sf — output can't be empty")
    val labels = SparkEntry.queries("q51_cluster")(spark, sf)
      .select(col("doc_id"), col("cluster_id"), expr(gate).as("del"))
    // every tombstoned doc's cluster appears, and no other
    val touched = labels.filter(col("del")).select("cluster_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("cluster_id")).toSet === touched)
    // n_del across the plan equals the corpus-wide tombstone count
    val nTomb = labels.filter(col("del")).count()
    assert(out.map(_.getAs[Long]("n_del")).sum === nTomb)
    // per-cluster arithmetic + sizes agree with the label table
    val sizes = labels.groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (cid, before, del, after) = (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("n_before"), r.getAs[Long]("n_del"), r.getAs[Long]("n_after"))
      assert(before === sizes(cid), s"cluster $cid size drifted from q51")
      assert(after === before - del)
      assert(del >= 1)
    }
  }

  test("q262 re-elects the min SURVIVING member; NULL iff the cluster is wiped") {
    val out = SparkEntry.queries("q262_forget")(spark, sf).collect()
    val survivors = SparkEntry.queries("q51_cluster")(spark, sf)
      .filter(expr(s"NOT ($gate)"))
      .groupBy("cluster_id").agg(min("doc_id").as("mn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      if (r.getAs[Long]("n_after") == 0L)
        assert(r.isNullAt(r.fieldIndex("new_keep")), s"wiped cluster $cid must re-elect NULL")
      else {
        val nk = r.getAs[Long]("new_keep")
        assert(nk === survivors(cid), s"cluster $cid re-elected $nk")
        // min-id convention: the new canonical can only move UP
        assert(nk >= cid)
      }
    }
  }

  test("q263 packs reconcile with q80's assignment and carry >= 1 tombstone each") {
    val out = SparkEntry.queries("q263_repack_plan")(spark, sf).collect()
    assert(out.nonEmpty)
    val packs = SparkEntry.queries("q80_packing_sharded")(spark, sf)
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("pack_id")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("chars"))).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("pack_id"))
      val (n, chars) = packs(key)
      assert(r.getAs[Long]("n_docs") === n, s"$key doc count drifted from q80")
      assert(r.getAs[Long]("chars_del") + r.getAs[Long]("chars_left") === chars,
        s"$key char mass split must partition the pack")
      assert(r.getAs[Long]("n_del") >= 1)
    }
    // blast radius accounts for every tombstoned doc exactly once
    val nTomb = Tables.documents(spark, sf).filter(expr(gate)).count()
    assert(out.map(_.getAs[Long]("n_del")).sum === nTomb)
  }
}
