package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index lifecycle — the storage half of the trained-IVF
  * contract (q72/q74's "at 100 TB cid is a partition column" posture,
  * made code): the corpus is written ONCE with the coarse assignment as
  * a physical partition column, and every query's probe scan then
  * partition-prunes to nprobe/k of the files before any byte is read.
  *
  * Write: one map-only assignment pass (plan-time centroid literals,
  * [[KMeans.assignExpr]]) + a partitioned parquet write. Rebuild is
  * per-retrain, not per-query. Probe: `spark.read` + `cid IN probes` —
  * Catalyst turns the predicate into PartitionFilters (pinned by
  * IvfIndexSpec), so the scan cost is probe-local at any corpus size.
  * The ADC/ranking stages compose on top unchanged.
  */
object IvfIndex {

  /** Materialize the index: (vec_id, q8) rows under cid=<assignment>
    * directories. */
  def write(qemb: DataFrame, model: Seq[KMeans.Centroid], path: String): Unit =
    qemb.select(col("vec_id"), col("q8"),
        KMeans.assignExpr(col("q8"), model).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Incremental index maintenance: assign a NEW batch with the same
    * frozen model and append it into the existing partition layout —
    * each batch row lands in its cid directory, probes see old + new
    * rows with no rebuild. (Model drift is the retrain trigger's job:
    * [[KMeans.aggregateStep]]'s streaming accumulation decides WHEN to
    * retrain; a retrain rewrites the index once, not per batch.) */
  def append(batch: DataFrame, model: Seq[KMeans.Centroid], path: String): Unit =
    batch.select(col("vec_id"), col("q8"),
        KMeans.assignExpr(col("q8"), model).as("cid"))
      .write.mode("append").partitionBy("cid").parquet(path)

  /** Probe scan: only the `probes` partitions are listed and read.
    * (The filter binds to the raw partition column BEFORE the cast so
    * it stays a PartitionFilter; directory-name inference types the
    * partition column INT, cast back to the model's LONG cids.) */
  def probe(spark: SparkSession, path: String, probes: Seq[Long]): DataFrame =
    spark.read.parquet(path).filter(col("cid").isin(probes: _*))
      .withColumn("cid", col("cid").cast(org.apache.spark.sql.types.LongType))
}
