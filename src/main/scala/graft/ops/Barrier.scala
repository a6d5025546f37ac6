package graft.ops

import org.apache.spark.sql.DataFrame

/** The materialization barrier used by the LSH dedup/similarity
  * pipelines (q18/q21/q23). Two jobs in one:
  *
  *  1. optimizer barrier — keeps threshold filters out of join
  *     conditions and stops a shared intermediate from re-executing
  *     once per consumer (measured 30× plan wins, see the call
  *     sites);
  *  2. lineage truncation — the intermediate is small (signatures /
  *     id pairs), its lineage is not.
  *
  * `localCheckpoint()` stores the blocks on executors: fast, but NOT
  * fault-tolerant — on a cluster, losing an executor loses lineage-
  * truncated blocks with no recompute path, killing the job. For a
  * 100 TB run set `spark.graft.checkpointDir` to a reliable path
  * (HDFS/object store): the barrier then uses `checkpoint()`, which
  * writes through to storage and survives executor loss. Local
  * iteration leaves the conf unset and keeps the cheap path.
  */
object Barrier {

  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
