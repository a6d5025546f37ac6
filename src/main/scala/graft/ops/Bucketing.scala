package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table writes — the storage-side answer to repeated
  * large-table joins. Two tables bucketed (and per-bucket sorted) on
  * the same key with the same bucket count join with ZERO exchange:
  * each task reads bucket i of both sides, so at 100 TB the join
  * costs a co-located merge instead of shuffling both corpora every
  * run. The write pays one hash-distribution pass; every downstream
  * join on the key rides it for free — the right trade for tables
  * joined more than once (doc_id-keyed text/embedding/label tables
  * in a training pipeline).
  *
  * `BucketingSpec` pins the plan: bucketed self/cross-table joins
  * must show no `Exchange hashpartitioning` on either input.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed + sorted on
    * `key`. Bucket counts must match across co-joined tables (Spark
    * can coalesce differing counts only when one divides the other
    * and `spark.sql.bucketing.coalesceBucketsInJoin.enabled` is on).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
