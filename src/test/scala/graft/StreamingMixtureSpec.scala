package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MixtureControl

/** Streaming mixture control: the q110 schedule as a runtime feedback
  * loop. Because state updates are associative long sums and the gate
  * is the deterministic md5-ppm hash, the stream-driven controller
  * must produce BIT-IDENTICAL gate trajectories to a batch fold of
  * the same slices — and the gates must actually steer: the
  * overrepresented language gets throttled, underrepresented ones
  * keep everything. */
class StreamingMixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // target: 50/50 en/de — but the "crawl" delivers ~4:1 en:de
  private val target = Map("en" -> 500000L, "de" -> 500000L)
  private val batches: Seq[Seq[(Long, String, Long)]] =
    (0 until 3).map { b =>
      val base = b * 100L
      (0L until 40L).map(i => (base + i, "en", 100L)) ++
        (40L until 50L).map(i => (base + i, "de", 100L))
    }

  private def df(rows: Seq[(Long, String, Long)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "lang", "n_tokens")
  }

  test("stream-driven gates equal the batch fold bit-for-bit") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ctl = new MixtureControl.Controller(target)
    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("doc_id", "lang", "n_tokens")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ctl.onBatch(b, id)
      }
      .start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()

    // batch replay of the identical slices
    var kept = Map.empty[String, Long]
    val replayGates = batches.map { b =>
      val g = MixtureControl.gates(kept, target)
      kept = MixtureControl.step(df(b), g, kept)
      g
    }
    assert(ctl.gateHistory.map(_._2) === replayGates,
      "stream gate trajectory diverged from the batch fold")
    assert(ctl.kept === kept, "kept-token state diverged from the batch fold")
  }

  test("the controller throttles the dominant language toward target") {
    var kept = Map.empty[String, Long]
    val gateSeq = batches.map { b =>
      val g = MixtureControl.gates(kept, target)
      kept = MixtureControl.step(df(b), g, kept)
      g
    }
    // cold start keeps everything
    assert(gateSeq.head === Map("en" -> 1000000L, "de" -> 1000000L))
    // after one 4:1 batch, en is overrepresented: gate strictly below
    // 1e6 and equal to (target·K) div k_en; de keeps everything
    assert(gateSeq(1)("de") === 1000000L)
    assert(gateSeq(1)("en") < 1000000L)
    // steering works: final kept mixture is closer to 50/50 than the
    // raw 4:1 stream
    val total = kept.values.sum
    val enShare = kept("en") * 1000000L / total
    assert(enShare < 800000L, s"en share $enShare not steered below raw 80%")
    // determinism of the gate itself: re-running a step yields the
    // same kept counts
    val again = MixtureControl.step(df(batches.head),
      Map("en" -> 1000000L, "de" -> 1000000L), Map.empty)
    assert(again === MixtureControl.step(df(batches.head),
      Map("en" -> 1000000L, "de" -> 1000000L), Map.empty))
  }

  test("languages outside the target mixture are dropped by the gate") {
    val rows = Seq((1L, "xx", 50L), (2L, "en", 50L))
    val kept = MixtureControl.step(df(rows),
      Map("en" -> 1000000L), Map.empty)
    assert(!kept.contains("xx"), "an untargeted language leaked through")
  }
}
