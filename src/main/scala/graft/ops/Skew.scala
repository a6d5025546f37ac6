package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is too hot for a
  * plain shuffle: classic salting.
  *
  * The fact side gets a uniform salt in `[0, buckets)` derived from a
  * high-cardinality row expression (deterministic — checkpoint/replay
  * safe, unlike `rand()`); the dimension side is replicated once per
  * salt value. The join key becomes (key, salt), splitting each hot
  * key's row group across `buckets` reducers. Result set is provably
  * identical to the unsalted join (asserted in SkewSpec).
  *
  * AQE's skew-join splitting (on in GraftSession) handles sort-merge
  * skew adaptively at runtime; explicit salting remains the tool when
  * a single key exceeds what one split can absorb (e.g., the empty
  * string or a null-ish sentinel holding 10% of 100 TB) or when the
  * join is a shuffled hash join AQE won't split.
  */
object Skew {

  /** Replicate `dim` once per salt bucket: adds `_salt` ∈ [0, buckets). */
  def replicateDim(dim: DataFrame, buckets: Int): DataFrame =
    dim.crossJoin(
      broadcast(dim.sparkSession.range(buckets.toLong).toDF("_salt")))

  /** Salt the fact side deterministically from `saltSource` (pick a
    * high-cardinality column, e.g. the row's primary key). */
  def saltFact(fact: DataFrame, saltSource: Column, buckets: Int): DataFrame =
    fact.withColumn("_salt", pmod(hash(saltSource), lit(buckets)).cast("long"))

  /** Inner equi-join of a skewed fact to a small-ish dim on `key`,
    * salted across `buckets` reducers. Output columns = fact ++ dim
    * (minus the helper `_salt`). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame =
    saltFact(fact, saltSource, buckets)
      .join(replicateDim(dim, buckets), Seq(key, "_salt"))
      .drop("_salt")
}
