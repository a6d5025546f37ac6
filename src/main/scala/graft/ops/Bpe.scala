package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training, relational form — the
  * trained-model analogue of [[KMeans]] for the text side: q85's
  * pair-frequency step iterated into actual merge rules.
  *
  * Semantics (the Sennrich BPE convention):
  *   - state is a symbol table: one row per (word, position, symbol),
  *     weighted by the word's corpus frequency;
  *   - each round counts adjacent-pair frequencies (overlapping
  *     occurrences count), picks the argmax pair with a deterministic
  *     (n DESC, lhs, rhs) tie-break, and merges it LEFTMOST-GREEDY
  *     NON-OVERLAPPING in every word ("a a a a" merging (a,a) →
  *     "aa aa", never "a aa a").
  *
  * The greedy merge is pure window algebra over one (w ORDER BY pos)
  * sort — no join, no per-row recursion: candidate rows (sym, nxt) =
  * (a, b) form runs only where overlaps are possible; a run member is
  * selected iff its offset from the run start is even, which IS the
  * leftmost-greedy rule. Both engines (Spark and the DuckDB oracle)
  * compute the identical selection, so training replays verbatim as
  * unrolled SQL — exact integer counts make the argmax
  * partition-order independent, the same determinism contract as
  * KMeans' integer centroid state.
  *
  * Scale posture at 100 TB: the corpus collapses to the DISTINCT
  * vocabulary before any BPE work (one corpus-wide shuffle carrying
  * (word, freq) — vocab-sized, bounded by language, not data size).
  * Every training round then costs one vocab-sized sort per word key
  * plus a pair aggregate whose output is |symbol-pairs| — tiny. The
  * per-round argmax is a 1-row collect (driver-side model state,
  * exactly Lloyd's-loop shape). Rounds materialize through [[Barrier]]
  * so the iteration's lineage never compounds (set
  * `spark.graft.checkpointDir` on a real cluster).
  *
  * Reference scope: the reference engine has no tokenizer; this is
  * part of the training-data-pipeline surface (SURVEY §2.2) that a
  * pretraining corpus build needs between curation and packing.
  */
object Bpe {

  /** One learned merge rule: at `step`, symbols `lhs`+`rhs` fused,
    * with corpus pair frequency `n` at selection time. */
  final case class Merge(step: Long, lhs: String, rhs: String, n: Long)

  private val wOrd = Window.partitionBy("w").orderBy("pos")
  private val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** (w, freq) → the initial symbol table: one row per character,
    * (w, freq, pos, sym). Empty words vanish (no positions). */
  def explodeSyms(vocab: DataFrame): DataFrame =
    vocab.select(col("w"), col("freq"),
      posexplode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .as(Seq("pos", "sym")))

  /** Attach the `__nxt` lookahead column if absent. Within [[train]]
    * the lookahead is computed ONCE per round inside [[applyMerge]]'s
    * own window stage and rides the materialized frame, so
    * [[pairCounts]] needs no sort of its own — per-round cost drops
    * from two (w, pos) sorts to one. The internal double-underscore
    * name is the provenance marker: only frames produced by THIS
    * object carry it, so a caller-supplied frame that happens to have
    * its own `nxt`-like column is never trusted as adjacency — the
    * lookahead is recomputed from (w, pos, sym). */
  private def withNext(syms: DataFrame): DataFrame =
    if (syms.columns.contains("__nxt")) syms
    else syms.withColumn("__nxt", lead(col("sym"), 1).over(wOrd))

  /** Freq-weighted adjacent-pair counts. Overlapping occurrences all
    * count ("aaa" has (a,a) twice) — the training statistic, distinct
    * from the non-overlapping APPLICATION rule. */
  def pairCounts(syms: DataFrame): DataFrame =
    withNext(syms)
      .filter(col("__nxt").isNotNull)
      .groupBy(col("sym").as("lhs"), col("__nxt").as("rhs"))
      .agg(sum(col("freq")).as("n"))

  /** The next merge rule: exact-integer argmax with (n DESC, lhs,
    * rhs) tie-break — deterministic under any partitioning. None when
    * no pairs remain. */
  def bestPair(syms: DataFrame, step: Int): Option[Merge] =
    pairCounts(syms)
      .orderBy(col("n").desc, col("lhs"), col("rhs"))
      .limit(1).collect().headOption
      .map(r => Merge(step.toLong, r.getString(0), r.getString(1), r.getLong(2)))

  /** Merge (a, b) leftmost-greedy non-overlapping in every word.
    *
    * All columns ride ONE window sort (w ORDER BY pos): candidate =
    * this row starts an (a, b) pair; a candidate STARTS a run iff its
    * predecessor row is not a candidate; runstart = running max of
    * start positions; selected iff (pos − runstart) is even (runs
    * longer than one candidate only exist when a = b); the row after
    * a selected candidate is consumed. Positions are then renumbered
    * dense so the next round's adjacency is positional again.
    *
    * The output carries the NEXT round's `nxt` lookahead computed in
    * the same pipeline: after the consumed-row filter the rows are
    * still (w, pos)-sorted and w-clustered from the first window
    * stage, so the trailing row_number/lead window adds NO exchange
    * and NO sort — one (w, pos) sort per merge round total. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame =
    withNext(syms)
      .withColumn("cand", col("sym") === a && col("__nxt") === b)
      .withColumn("st",
        when(col("cand") && !coalesce(lag(col("cand"), 1).over(wOrd), lit(false)),
          col("pos")))
      .withColumn("runstart", max(col("st")).over(wRun))
      .withColumn("selhere",
        col("cand") && (col("pos") - col("runstart")) % 2 === 0)
      .withColumn("selprev",
        coalesce(lag(col("selhere"), 1).over(wOrd), lit(false)))
      .withColumn("newsym",
        when(col("selhere"), concat(col("sym"), col("__nxt")))
          .otherwise(col("sym")))
      .filter(!col("selprev"))
      .select(col("w"), col("freq"),
        row_number().over(wOrd).as("npos"),
        col("newsym").as("sym"),
        lead(col("newsym"), 1).over(wOrd).as("__nxt"))
      .withColumnRenamed("npos", "pos")

  /** Train `rounds` merge rules over a (w, freq) vocabulary. Returns
    * the learned rules and the final (merged) symbol table — the
    * vocabulary's tokenization under the trained merges. */
  def train(vocab: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"Bpe.train: rounds must be >= 1, got $rounds")
    // each barriered round frame carries its own `nxt` lookahead, so
    // bestPair's pair aggregate reads the materialized rows with no
    // window sort — the round's single sort lives inside applyMerge
    var syms = Barrier(withNext(explodeSyms(vocab)))
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      bestPair(syms, k + 1) match {
        case Some(m) =>
          merges += m
          syms = Barrier(applyMerge(syms, m.lhs, m.rhs))
        case None => exhausted = true
      }
      k += 1
    }
    (merges.result(), syms.drop("__nxt"))
  }
}
