package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the q59 funnel's gates applied to a
  * document STREAM (the ingest path of a corpus build: filter the
  * crawl as it lands instead of re-scanning it later).
  *
  * Everything here is deliberately STATELESS: quality and repetition
  * are per-document projections, and decontamination probes a
  * pre-built eval-split bloom filter that rides the task closure —
  * no state store, no watermark, no shuffle. A 100 TB/day crawl
  * streams through at source parallelism; the only coordination is
  * re-broadcasting the bloom when the eval set changes. Exact-dedup
  * is the one funnel gate that needs state and stays out of this
  * module — compose [[NozzlePipeline.dedupStream]]'s
  * watermark-bounded form (on `md5(t)`) downstream when at-most-once
  * content is required on the stream itself.
  *
  * The bloom probe admits false POSITIVES only (a clean document can
  * be flagged, bounded by the filter's FPP — ~0.04% at 16 bits/key),
  * never false negatives: every truly contaminated document is
  * flagged. That is the correct polarity for decontamination — the
  * batch exact probe (q55) re-confirms flagged survivors offline.
  */
object Curation {

  /** The corpus-wide text normalization (same as TextQueries). */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** The quality gate — ONE definition shared by the batch funnel
    * (q59) and the streaming [[gate]], so the two cannot drift
    * (StreamingCurationSpec asserts parity). The mean-token-length
    * band is the integer-division BETWEEN restated as pure integer
    * inequalities (300 ≤ (wc·100) div n ≤ 800 ⟺ 300n ≤ wc·100 < 801n
    * for n > 0), so it composes from Columns without an expr(). */
  def qualityOk(nWords: Column, nStop: Column, nWordchars: Column): Column =
    nWords >= 30 && nStop * 10 <= nWords &&
      nWordchars * 100 >= nWords * 300 && nWordchars * 100 < nWords * 801

  /** The repetition gate (Gopher/C4-style) — shared like [[qualityOk]]:
    * ≤30% duplicate words and the dominant adjacent bigram ≤20%. */
  def repOk(nWords: Column, nTypes: Column, topBigramN: Column): Column =
    (nWords - nTypes) * 100 <= nWords * 30 &&
      topBigramN * 100 <= greatest(nWords - 1, lit(1L)) * 20

  /** Batch-build the eval split's shingle bloom: one binary value, a
    * few MB at any eval-set size, order-independent. `k` is the span
    * width (production decontamination: 8-13 words; wider is MORE
    * selective, so the filter only shrinks) and must match the
    * [[gate]] probe's. */
  def evalShingleBloom(evalDocs: DataFrame, numBits: Int = 1 << 20, k: Int = 3): Array[Byte] =
    evalDocs
      .select(explode(graft.Functions.word_shingles(normText(col("text")), k)).as("span"))
      .agg(graft.Functions.bloom_agg(xxhash64(col("span")), numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Per-document gate verdicts over a streaming (or batch) documents
    * relation with a `text` column: the input columns plus
    * `quality_ok`, `rep_ok`, `contaminated`, `kept` (those four names
    * are the output contract and shadow same-named inputs). Map-only
    * and stateless: legal under any trigger and output mode, no state
    * operator in the plan (pinned by StreamingCurationSpec).
    * Intermediates use reserved `__cur_`-prefixed names so caller
    * columns like `t` or `r` are never clobbered. */
  def gate(docs: DataFrame, evalBloom: Array[Byte], k: Int = 3): DataFrame = {
    val probed = docs
      .withColumn("__cur_t", normText(col("text")))
      .withColumn("__cur_r", graft.Functions.repetition_stats(col("__cur_t")))
      .withColumn("__cur_nstop",
        expr("cast(size(filter(split(__cur_t, ' '), w -> w in ('the', 'a'))) as bigint)"))
      .withColumn("__cur_nwc",
        length(regexp_replace(col("__cur_t"), " ", "")).cast("long"))
      .withColumn("contaminated",
        exists(graft.Functions.word_shingles(col("__cur_t"), k),
          s => graft.Functions.bloom_contains(lit(evalBloom), xxhash64(s))))
    probed
      .withColumn("quality_ok",
        qualityOk(col("__cur_r.n_words"), col("__cur_nstop"), col("__cur_nwc")))
      .withColumn("rep_ok",
        repOk(col("__cur_r.n_words"), col("__cur_r.n_types"), col("__cur_r.top_bigram_n")))
      .withColumn("kept", col("quality_ok") && col("rep_ok") && !col("contaminated"))
      .drop("__cur_t", "__cur_r", "__cur_nstop", "__cur_nwc")
  }

  /** The gate composed as a stream filter: only kept documents pass. */
  def keptStream(docs: DataFrame, evalBloom: Array[Byte], k: Int = 3): DataFrame =
    gate(docs, evalBloom, k).filter(col("kept"))
      .drop("quality_ok", "rep_ok", "contaminated", "kept")
}
