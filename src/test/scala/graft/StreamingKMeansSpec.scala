package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeans

/** Streaming codebook maintenance: because [[KMeans]] carries EXACT
  * integer state, the frozen-model aggregation step is associative —
  * micro-batch steps merged with `mergeSteps` must equal the one-shot
  * step over the union BIT-FOR-BIT (not approximately). That identity
  * is what makes the codebook maintainable from a stream at 100 TB:
  * each micro-batch contributes k·(d+1) longs, the accumulator lives
  * on the driver (broadcast-sized), and retraining is a decision on
  * exact drift numbers, never a second pass over history.
  */
class StreamingKMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dim = 4
  private val data: Seq[(Long, Seq[Long])] =
    ((1L to 30L).map(i => i -> Seq(0L + i % 5, 1L, 2L, i % 3)) ++
      (101L to 130L).map(i => i -> Seq(100L + i % 5, 99L, 98L, 100L + i % 3)))

  private def df(rows: Seq[(Long, Seq[Long])]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("id", "v")
  }

  test("micro-batch steps merge to the exact one-shot aggregate (associativity)") {
    val model = KMeans.seedsFromIds(df(data), "id", "v", Seq(1L, 101L))
    val whole = KMeans.aggregateStep(df(data), "v", dim, model)
    val slices = data.grouped(17).toSeq // uneven batch sizes on purpose
    val merged = slices.map(s => KMeans.aggregateStep(df(s), "v", dim, model))
      .reduce(KMeans.mergeSteps)
    assert(merged.keySet === whole.keySet)
    merged.foreach { case (cid, c) =>
      assert(c.sameAs(whole(cid)), s"cluster $cid diverged across micro-batches")
    }
  }

  test("a live stream accumulates the codebook state exactly") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val model = KMeans.seedsFromIds(df(data), "id", "v", Seq(1L, 101L))
    val acc = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[Long, KMeans.Centroid])

    val input = MemoryStream[(Long, Seq[Long])]
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val step = KMeans.aggregateStep(batch, "v", dim, model)
        acc.updateAndGet(prev => KMeans.mergeSteps(prev, step))
        ()
      }
      .start()
    try {
      data.grouped(11).foreach { slice => input.addData(slice); q.processAllAvailable() }
    } finally q.stop()

    val whole = KMeans.aggregateStep(df(data), "v", dim, model)
    assert(acc.get().keySet === whole.keySet)
    acc.get().foreach { case (cid, c) =>
      assert(c.sameAs(whole(cid)), s"cluster $cid drifted from the batch truth")
    }
    // folding the accumulated step IS one Lloyd round: identical to
    // the batch train(maxIter = 1)
    val streamed = KMeans.applyStep(model, acc.get())
    val batch1 = KMeans.train(df(data), "id", "v", dim, model, maxIter = 1)
    assert(streamed.zip(batch1).forall { case (a, b) => a.sameAs(b) })
  }

  test("retrain loop e2e: accumulate, trip the exact drift threshold, swap mid-stream") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // two tight clusters; the A-side batches walk away from the seed
    // so drift grows deterministically batch over batch
    def pt(v: Long): Seq[Long] = Seq(v, v, v, v)
    val seedRows = Seq(1L -> pt(10), 2L -> pt(100))
    val batches: Seq[Seq[(Long, Seq[Long])]] = Seq(
      (10L to 19L).map(i => i -> pt(10)),  // on the seed: no drift
      (20L to 29L).map(i => i -> pt(12)),  // mean → 230/21 ≈ 10.95: drift > 1/2 → swap
      (30L to 39L).map(i => i -> pt(14)))  // under model', drifts again → second swap
    val initial = KMeans.seedsFromIds(df(seedRows), "id", "v", Seq(1L, 2L))

    // the decision loop: accumulate per micro-batch under the FROZEN
    // serving model; when the folded candidate drifts past tau = 1/2,
    // swap it in and reset the accumulator
    val model = new java.util.concurrent.atomic.AtomicReference(initial)
    val acc = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[Long, KMeans.Centroid])
    val swaps = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    val input = MemoryStream[(Long, Seq[Long])]
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val m = model.get()
        val merged = acc.updateAndGet(prev =>
          KMeans.mergeSteps(prev, KMeans.aggregateStep(batch, "v", dim, m)))
        val candidate = KMeans.applyStep(m, merged)
        if (KMeans.driftExceeds(m, candidate, tauNum = 1, tauDen = 2)) {
          model.set(candidate)
          acc.set(Map.empty)
          swaps.add(id)
          ()
        }
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // the threshold tripped exactly where the arithmetic says: batch 1
    // (0-indexed) and again at batch 2 under the swapped model
    assert(swaps.toArray.toSeq === Seq(1L, 2L), s"swap batches: $swaps")

    // first swap == the batch retrain over everything the stream had
    // seen, bit-for-bit (one Lloyd round under the initial model)
    val retrain1 = KMeans.train(df(batches(0) ++ batches(1)), "id", "v", dim,
      initial, maxIter = 1)
    // second swap == one Lloyd round over batch 2 under the first
    // swapped model (the accumulator was reset at the swap)
    val retrain2 = KMeans.train(df(batches(2)), "id", "v", dim,
      retrain1, maxIter = 1)
    assert(model.get().zip(retrain2).forall { case (a, b) => a.sameAs(b) },
      "mid-stream swapped model diverged from the batch retrain")
    // and the untouched B cluster kept its state through both swaps
    assert(model.get().find(_.cid == 2L).get.sameAs(initial.find(_.cid == 2L).get))
  }
}
