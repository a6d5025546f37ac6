package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-layout planning — the small-files / giant-files control for
  * a partitioned lakehouse write, and the missing half of the storage
  * story next to [[Bucketing]] (which optimizes the JOIN path; this
  * optimizes the FILE layout a 100 TB corpus lands in).
  *
  * The failure modes it prevents are both real at scale:
  *  - a `partitionBy(keys)` write with one task per partition value
  *    produces ONE file per partition — a 2 TB `lang=en` parquet file
  *    no downstream scan can split below row-group granularity;
  *  - a plain `repartition(N).write.partitionBy(keys)` write makes
  *    every task append to every partition dir — N × |partitions|
  *    files, the classic small-files explosion that melts the
  *    listing path and the name node.
  *
  * The fix is a two-pass plan-then-write: one partial-agg'd rollup
  * measures exact per-partition byte totals, the per-partition shard
  * count is ceil(bytes / targetBytes) (exact integer), and the write
  * repartitions on (keys…, shard) — shard = hash(id) mod n_shards,
  * deterministic — so every (partition dir, shard) lands as exactly
  * ONE file of ~targetBytes. Total files = Σ ceil(bytes/target): the
  * minimum count that respects the size bound. The plan frame is
  * |partition values|-sized and broadcasts onto the write pass; the
  * data crosses the wire once, keyed by (keys, shard) — no second
  * full pass, no driver-side data.
  */
object OutputLayout {

  /** Per-partition-key shard plan: exact byte totals from one
    * map-side-combined rollup and the ceil-division shard count.
    * Output: keys… , n_rows, bytes, n_shards. */
  def plan(df: DataFrame, keys: Seq[String], bytesCol: String,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"outputlayout: targetBytes $targetBytes must be positive")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(bytesCol)).cast(org.apache.spark.sql.types.LongType).as("bytes"))
      .withColumn("n_shards",
        expr(s"(bytes + ${targetBytes - 1}L) div ${targetBytes}L"))
  }

  /** Deterministic shard assignment under a broadcast plan: shard =
    * pmod(xxhash64(id), n_shards) — stable across runs and cluster
    * sizes, so a re-run lands every row in the same file. */
  private def withShard(df: DataFrame, keys: Seq[String], idCol: String,
                        planFrame: DataFrame): DataFrame =
    df.join(broadcast(planFrame.select((keys.map(col) :+ col("n_shards")): _*)),
        keys)
      .withColumn("shard", pmod(xxhash64(col(idCol)), col("n_shards")))
      .drop("n_shards")

  /** Byte-bounded partitioned write: plan, assign shards, repartition
    * on (keys…, shard) so each (partition dir, shard) is produced by
    * exactly one task — one ~targetBytes file each — and write
    * `partitionBy(keys…, shard)`. Returns the plan for the caller's
    * manifest. */
  def write(df: DataFrame, path: String, keys: Seq[String], bytesCol: String,
            idCol: String, targetBytes: Long): DataFrame = {
    val p = plan(df, keys, bytesCol, targetBytes)
    val sharded = withShard(df, keys, idCol, p)
    val partCols = keys :+ "shard"
    sharded
      .repartition(partCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
    p
  }
}
