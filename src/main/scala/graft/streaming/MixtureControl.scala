package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming mixture CONTROL — q110's static token-budget schedule
  * turned into a runtime feedback loop: as document batches land, the
  * controller tracks accumulated KEPT tokens per language and emits
  * the per-language keep-rate (ppm hash gate) for the NEXT batch, so
  * the kept mixture steers toward the target weights no matter what
  * mixture the crawl actually delivers.
  *
  * Control law (exact integer math, deterministic):
  *
  *   g_l = min(1e6, (target_l · K) div k_l)        (k_l = 0 → 1e6)
  *
  * where k_l is the accumulated kept tokens of language l and K the
  * total. A language under its target share keeps everything
  * (ratio > 1, clamps to 1e6); an overrepresented language keeps
  * exactly the fraction that would land it on target against the
  * current accumulation — the discrete analogue of a proportional
  * controller, and self-correcting: as k_l/K approaches target_l/1e6
  * the gate approaches equilibrium keep-rate.
  *
  * Scale posture: the per-batch work is ONE map-side-combined
  * groupBy(lang) over the batch (the gate itself is a map-only
  * deterministic md5-ppm hash probe, the q41/q95 discipline); the
  * driver holds languages-sized state — the KMeans/Bpe decision-loop
  * shape, not a data-sized collect. State updates are associative
  * long sums, so replaying the same batches in the same order yields
  * bit-identical gate trajectories (StreamingMixtureSpec pins stream
  * ≡ batch-fold parity).
  */
object MixtureControl {

  /** Next-batch gates from accumulated kept tokens. */
  def gates(kept: Map[String, Long], targetPpm: Map[String, Long]): Map[String, Long] = {
    val total = kept.values.sum
    targetPpm.map { case (l, w) =>
      val k = kept.getOrElse(l, 0L)
      val g =
        if (total == 0L || k == 0L) 1000000L
        else math.min(1000000L, (w * total) / k)
      l -> g
    }
  }

  /** The deterministic ppm hash gate on doc_id — identical to the
    * q41/q95 batch samplers so a kept set is replayable offline. */
  def hashPpm(docId: Column): Column =
    pmod(conv(substring(md5(docId.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(1000000L))

  /** Keep predicate for a batch under the given gates. Languages
    * absent from the gate table are dropped (gate 0) — the controller
    * only admits languages the target mixture names. */
  def keepExpr(gatePpm: Map[String, Long]): Column = {
    val g = typedLit(gatePpm)
    hashPpm(col("doc_id")) < coalesce(element_at(g, col("lang")), lit(0L))
  }

  /** Fold ONE batch: kept tokens per language under `gatePpm`, merged
    * into `kept`. The aggregate is languages-sized (driver decision
    * loop, not a data collect). */
  def step(batch: DataFrame, gatePpm: Map[String, Long],
           kept: Map[String, Long]): Map[String, Long] = {
    val got = batch
      .filter(keepExpr(gatePpm))
      .groupBy("lang").agg(sum(col("n_tokens")).as("kt"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    (kept.keySet ++ got.keySet).map { l =>
      l -> (kept.getOrElse(l, 0L) + got.getOrElse(l, 0L))
    }.toMap
  }

  /** Mutable controller driven from foreachBatch: applies the current
    * gates to each arriving batch, folds the kept counts, and records
    * the gate trajectory (batch id → gates used) for auditing. */
  final class Controller(targetPpm: Map[String, Long]) extends Serializable {
    @volatile private var keptState: Map[String, Long] = Map.empty
    private val trajectory = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Long])]

    def kept: Map[String, Long] = keptState
    def gateHistory: Seq[(Long, Map[String, Long])] = trajectory.toSeq
    def currentGates: Map[String, Long] = gates(keptState, targetPpm)

    /** foreachBatch body: gate with the CURRENT gates, then update. */
    def onBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      val g = currentGates
      trajectory += ((batchId, g))
      keptState = step(batch, g, keptState)
    }
  }
}
