package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder2

/** Z-order key semantics and the layout property it exists for:
  * interleave correctness against a slow bit loop, loud range
  * rejection, and the locality proof — consecutive runs of a
  * z-sorted table have bounded 2-D bounding boxes, which is what
  * makes parquet min/max pruning work on both dimensions. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def slowInterleave(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the slow bit loop on goldens and randoms") {
    assert(ZOrder2.interleave(0L, 0L) === 0L)
    assert(ZOrder2.interleave(1L, 0L) === 1L)
    assert(ZOrder2.interleave(0L, 1L) === 2L)
    assert(ZOrder2.interleave(7L, 0L) === 21L)   // 0b010101
    assert(ZOrder2.interleave(0L, 7L) === 42L)   // 0b101010
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong().abs & ((1L << 31) - 1)
      val b = rnd.nextLong().abs & ((1L << 31) - 1)
      assert(ZOrder2.interleave(a, b) === slowInterleave(a, b))
    }
  }

  test("monotone in each dimension within a fixed other-coordinate block") {
    // within an aligned 8-block, growing either coordinate grows the key
    (0L until 8L).foreach { x =>
      assert(ZOrder2.interleave(x, 3L) < ZOrder2.interleave(x + 1, 3L))
      assert(ZOrder2.interleave(3L, x) < ZOrder2.interleave(3L, x + 1))
    }
  }

  test("out-of-range inputs are rejected loudly") {
    val e = intercept[IllegalArgumentException](ZOrder2.interleave(-1L, 0L))
    assert(e.getMessage.contains("de-cluster"))
    intercept[IllegalArgumentException](ZOrder2.interleave(0L, 1L << 31))
  }

  test("z-sorted runs have tight bounding boxes; a row-major sort does not") {
    // 64×64 grid, z-sort, cut into 64-row runs (one z-tile each):
    // every run's bbox is exactly 8×8 = 64 cells. The same cut over a
    // row-major (x-leading) sort gives 1×64 strips that span the full
    // y range — no pruning on y.
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val zsorted = pts.sortBy { case (x, y) => ZOrder2.interleave(x, y) }
    zsorted.grouped(64).foreach { run =>
      val w = run.map(_._1).max - run.map(_._1).min + 1
      val h = run.map(_._2).max - run.map(_._2).min + 1
      assert(w == 8 && h == 8, s"z-run bbox was ${w}x$h, expected 8x8")
    }
    val rowMajor = pts.sortBy { case (x, y) => (x, y) }
    val strip = rowMajor.grouped(64).next()
    assert(strip.map(_._2).max - strip.map(_._2).min + 1 == 64)
  }

  test("repartitionByRange on the key plans a range exchange (layout path)") {
    import spark.implicits._
    val df = (0L until 512L).map(i => (i % 32, i / 32)).toDF("x", "y")
      .withColumn("zkey", Functions.zorder2(col("x"), col("y")))
      .repartitionByRange(4, col("zkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"layout write should range-partition by zkey:\n$plan")
    // (codegen containment is pinned on q93's parquet-backed plan in
    // PlanAuditSpec — a local relation constant-folds the key here)
  }

  test("SQL name agrees with the Scala API") {
    import spark.implicits._
    Functions.register(spark)
    Seq((5L, 9L)).toDF("a", "b").createOrReplaceTempView("z_in")
    val viaSql = spark.sql("SELECT zorder2(a, b) z FROM z_in").collect()(0).getLong(0)
    assert(viaSql === ZOrder2.interleave(5L, 9L))
  }
}
