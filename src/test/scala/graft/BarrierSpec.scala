package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Barrier

/** The pluggable LSH-pipeline barrier: localCheckpoint by default,
  * reliable checkpoint() when `spark.graft.checkpointDir` is set
  * (the cluster-scale path — executor loss must not kill a 100 TB
  * dedup job).
  */
class BarrierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("reliable path writes through to the checkpoint dir with identical results") {
    val local = SparkEntry.queries("q23_embdup")(spark, sf).collect().toSeq

    val dir = Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Barrier.ConfKey, dir)
    try {
      val reliable = SparkEntry.queries("q23_embdup")(spark, sf).collect().toSeq
      assert(reliable === local)
      // the barrier actually wrote through to reliable storage
      val files = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Barrier.ConfKey)
    }
  }

  test("default path stays on executor-local storage") {
    val dir = Files.createTempDirectory("graft-unused-ckpt").toString
    // conf unset -> localCheckpoint; nothing may land in any directory
    val rows = SparkEntry.queries("q23_embdup")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_)).count() === 0)
  }
}
