package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench for the AsOfJoinExec codegen decision (VERDICT r9 #7):
  * is the interpreted two-pointer merge the bottleneck, or do the
  * codegen'd exchange+sort stages around it dominate?
  *
  * Times three plans over the same synthetic keyed time series:
  *  1. `native`  — AsOf.join (AsOfJoinExec, row-at-a-time merge)
  *  2. `window`  — the running-struct-max + filter composition
  *                 (fully WholeStageCodegen'd, but carries the left
  *                 AND right rows through one union'd sort)
  *  3. `sortonly` — just the exchange+sort+count of both sides: the
  *                 plan's codegen'd scaffolding with a no-op "join",
  *                 isolating what the merge itself can possibly cost
  *
  * Usage: sbt "runMain graft.plans.AsOfMicroBench [nLeft] [nRight] [keys]"
  * Prints one JSON line with min-of-5 seconds per plan.
  */
object AsOfMicroBench {
  def main(args: Array[String]): Unit = {
    val nl = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nr = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val keys = args.lift(2).map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("asof-micro")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession(spark)

    // deterministic skewless keyed series; times unique within key
    val l = spark.range(nl).select(
      (col("id") % keys).as("k"), expr(s"id div $keys").as("t"),
      col("id").as("lid"))
    val r = spark.range(nr).select(
      (col("id") % keys).as("rk"),
      expr(s"(id div $keys) * 2").as("rt"), col("id").as("rid"))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0); (System.nanoTime() - t0) / 1e9
    }
    def minOf(runs: Int)(f: => Long): Double =
      (1 to runs).map(_ => time(f)).min
    // force the join RESULT to be computed: a bare count() lets
    // column pruning delete the window/merge entirely
    def sumRid(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("rid"))).head().getLong(0)

    // warm-up both paths once
    AsOf.join(l, r, "k", "rk", "t", "rt").count()

    val native = minOf(5) {
      sumRid(AsOf.join(l, r, "k", "rk", "t", "rt"))
    }
    val win = minOf(5) {
      // running struct-max composition of the same backward as-of
      val tagged = l.select(col("k"), col("t"), col("lid"),
          lit(null).cast("long").as("rid"), lit(true).as("isL"))
        .unionByName(r.select(col("rk").as("k"), col("rt").as("t"),
          lit(null).cast("long").as("lid"), col("rid"), lit(false).as("isL")))
      val w = Window.partitionBy("k").orderBy("t", "isL")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sumRid(tagged
        .withColumn("m", max(when(!col("isL"), struct(col("t"), col("rid")))).over(w))
        .filter(col("isL"))
        .select(col("lid"), col("m.rid").as("rid")))
    }
    val sortonly = minOf(5) {
      // the codegen'd scaffolding alone: exchange + sort both sides
      l.repartition(32, col("k")).sortWithinPartitions("k", "t").count() +
        r.repartition(32, col("rk")).sortWithinPartitions("rk", "rt").count()
    }
    println(s"""{"nl":$nl,"nr":$nr,"keys":$keys,"native_s":$native,"window_s":$win,"sortonly_s":$sortonly}""")
    spark.stop()
  }
}
