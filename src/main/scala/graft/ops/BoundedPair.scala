package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared pair-budget guard for every bucket-equality pair join
  * (LSH buckets, k-means cells, signature buckets). Bucket-local
  * self-joins are the engine's one quadratic surface: a bucket of b
  * rows emits b²/2 candidate pairs, so if E[b] grows with the corpus
  * the join is quadratic at scale even though it is never all-pairs
  * (measured at the sf1 decade: 17-76× wall for 10× data on the five
  * fixed-dial pair queries, BENCH_NOTES.md round 10).
  *
  * The guard makes per-bucket membership a BUDGET, not a corpus
  * artifact: a broadcast census counts each bucket, and every bucket
  * over `budget` is refined by e = ceil(log2(bn/budget)) extra bits
  * taken from a caller-supplied refinement column (`refCol`), so the
  * expected refined membership is back at ~budget and total pair work
  * is ≤ ~n·budget/2 — LINEAR in the corpus. Buckets at or under
  * budget keep e = 0, making the refined key equal (as an equivalence
  * class) to the raw bucket: on a corpus whose largest bucket fits
  * the budget the guard is a provable no-op, which is what keeps the
  * sf0.01 oracle results byte-identical (total corpus 500 rows <
  * default budget) while the sf1+ decade gets the bound.
  *
  * What the refinement bits must be: a locality signature of the SAME
  * family as the bucket itself — extra hyperplane signs for an
  * annBucket, extra threshold cuts for a histogram signature — so
  * that (a) exact duplicates, which agree on every deterministic
  * function of their vector, agree on ALL refinement bits and are
  * never separated at any depth (the dupes-subset invariant is
  * width-proof), and (b) near-duplicates agree on most bits and
  * survive with LSH-grade recall. Refining by a uniform hash instead
  * would bound cost identically but destroy near-dup recall.
  *
  * Plan shape at 100 TB: the census is one partial-agg'd groupBy
  * whose result is buckets-sized (≪ corpus, broadcast by
  * construction); the refinement is a broadcast-hash-join lookup plus
  * two integer ops per row; the pair join then shuffles on the
  * refined key exactly as it shuffled on the raw bucket. Nothing
  * about the join strategy changes — only the key's cardinality.
  *
  * Reference scope note: the reference (kafka-firehose-nozzle) has no
  * pair operators; this guard belongs to the training-data-pipeline
  * extension (dedup/ANN family, SURVEY §2.2).
  */
object BoundedPair {

  /** Default per-bucket membership budget, sized for NEAR-UNIFORM
    * bucket families (random hyperplanes): 256 sits 6× above q23's
    * measured sf0.01 maximum (40) and above the sf0.1 maxima (163),
    * so oracle and driver-bench results are unchanged, while sf1's
    * ~1300-row buckets refine to ~160-row sub-buckets. At a fixed
    * budget total pair work is ≤ n·budget/2: ~2.6M pairs at sf1's
    * 20k vectors vs ~13M unguarded. Families whose buckets are
    * DATA-DRIVEN and can skew (k-means cells, media signatures — 86%
    * of media rows share one bucket) pass 512 explicitly: ≥ the whole
    * 500-row oracle corpus, so the guard is quiet at sf0.01 by
    * construction, not by a measured margin a testdata regen could
    * erode. */
  val DefaultBudget = 256L

  /** Maximum refinement depth: 2^16 sub-buckets caps the key blowup
    * and matches the 16 refinement bits the call sites derive. */
  val MaxBits = 16

  /** Adds `outCol`, a budget-bounded refinement of `bucketCol`:
    * struct(bucket, low-e-bits-of-ref) where e comes from the
    * broadcast census (0 for buckets within budget). Join pair sides
    * on `outCol` equality instead of `bucketCol` equality; keep using
    * `bucketCol` for output columns (e.g. q100's cid) — the guard
    * changes the JOIN key only.
    *
    * `refCol` must be a non-negative integer column with ≥ MaxBits
    * locality-signature bits (see object doc). */
  /** The refinement depth for a bucket of `bn` rows: the smallest e
    * with bn ≤ budget·2^e, capped at MaxBits — ceil(log2(bn/budget))
    * computed as an EXACT integer CASE ladder (MaxBits+1 arms), never
    * a float log: floating log2 can land a power-of-two ratio an ulp
    * above the integer and bump e differently per engine/libm, which
    * would make the guard's sub-banding irreproducible in an oracle
    * (q261 replays this ladder in DuckDB verbatim). */
  private[graft] def depthExpr(bn: Column, budget: Long): Column =
    (1 to MaxBits).foldLeft(when(bn <= budget, lit(0))) { case (acc, e) =>
      acc.when(bn <= (budget << e), lit(e))
    }.otherwise(lit(MaxBits))

  def refined(df: DataFrame, bucketCol: String, refCol: String, outCol: String,
              budget: Long = DefaultBudget): DataFrame = {
    require(budget >= 1, s"pair budget must be positive, got $budget")
    val census = df.groupBy(col(bucketCol)).agg(count(lit(1)).as("__bp_bn"))
      .select(col(bucketCol), depthExpr(col("__bp_bn"), budget).as("__bp_e"))
    df.join(broadcast(census), Seq(bucketCol))
      .withColumn(outCol,
        struct(col(bucketCol).as("b"),
          col(refCol).bitwiseAND(expr("shiftleft(1L, __bp_e) - 1L")).as("sub")))
      .drop("__bp_e")
  }
}
