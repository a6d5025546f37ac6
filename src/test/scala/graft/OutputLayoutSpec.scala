package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OutputLayout

/** Byte-bounded partitioned writes: the plan's ceil-division
  * arithmetic, one file per (partition dir, shard) leaf, row
  * round-trip, deterministic shard assignment across runs, and the
  * loud target guard. */
class OutputLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("plan: n_shards is exact ceil(bytes / target) per partition key") {
    val p = OutputLayout.plan(docs, Seq("lang", "source"), "n_chars", 2000L)
      .collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      val bytes = r.getAs[Long]("bytes")
      val nShards = r.getAs[Long]("n_shards")
      assert(nShards === (bytes + 1999L) / 2000L,
        s"ceil division broke for ${r.mkString(",")}")
      assert(nShards >= 1L)
    }
    // cross-check one total against a direct aggregation
    val want = docs.groupBy("lang", "source").count().count()
    assert(p.length.toLong === want)
  }

  test("write: one file per leaf dir, leaf count = total planned shards, rows round-trip") {
    val out = tmp("olayout").resolve("corpus").toString
    val plan = OutputLayout.write(docs, out, Seq("lang", "source"),
      "n_chars", "doc_id", 2000L)
    val totalShards = plan.agg(sum("n_shards")).head().getLong(0)
    // every (lang=…/source=…/shard=…) leaf holds exactly one data file
    val leaves = Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard="))
      .toSeq
    assert(leaves.size.toLong === totalShards,
      s"leaf dirs ${leaves.size} != planned shards $totalShards")
    leaves.foreach { leaf =>
      val files = Files.list(leaf).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size === 1,
        s"leaf $leaf has ${files.size} files — small-files explosion or a split shard")
    }
    // row round-trip with partition values intact
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val got = back.select("doc_id", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val want = docs.select("doc_id", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(got === want)
  }

  test("write: shard assignment is deterministic across runs") {
    val out1 = tmp("olayout1").resolve("c").toString
    val out2 = tmp("olayout2").resolve("c").toString
    OutputLayout.write(docs, out1, Seq("lang"), "n_chars", "doc_id", 3000L)
    OutputLayout.write(docs, out2, Seq("lang"), "n_chars", "doc_id", 3000L)
    def shards(p: String) = spark.read.parquet(p)
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getAs[Number]("shard").longValue)).sorted
    assert(shards(out1) === shards(out2))
  }

  test("non-positive target fails loudly") {
    val e = intercept[IllegalArgumentException] {
      OutputLayout.plan(docs, Seq("lang"), "n_chars", 0L)
    }
    assert(e.getMessage.contains("targetBytes"))
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
