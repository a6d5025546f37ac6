package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved micro-bench for the [[Md5Prefix60]] kernel vs
  * the spelled `cast(conv(substring(md5(x), 1, 15), 16, 10) as
  * bigint)` form it replaces (the [[graft.plans.Md5PrefixFold]]
  * rewrite). Both arms hash 10M strings; `% 1000000` keeps the
  * checksum inside a Long.
  *
  * Recorded result (local[8], Java 17, 2026-08-15): fused ≈ 0.50× the
  * spelled wall-clock, bit-identical checksums — the hex-string
  * materialization + substring + base-16 parse cost as much as the
  * MD5 itself. Per full-suite query the delta is low-single-digit
  * percent (hashing is one stage among many), which disappears into
  * fresh-JVM noise in subset benches — THIS interleaved same-JVM form
  * is the measurement that isolates it. */
object Md5PrefixMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // getOrCreate may hand back a session that already carries the
    // fold rule (sbt console, combined runners) — then BOTH arms
    // would run fused and the bench silently reports ~1.0×; the
    // spelled arm must stay spelled
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.Md5PrefixFold)
    val n = 10000000L
    def spelled = spark.range(n).selectExpr(
      "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint) % 1000000 h")
      .agg(sum("h")).head().getLong(0)
    def fused = spark.range(n).select(
      (graft.Functions.md5prefix60(col("id").cast("string").cast("binary"))
        % 1000000).as("h"))
      .agg(sum("h")).head().getLong(0)
    spelled; fused // JIT + codegen warm-up
    for (r <- 1 to 3) {
      var t0 = System.nanoTime(); val a = spelled
      val tS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); val b = fused
      val tF = (System.nanoTime() - t0) / 1e9
      println(f"ROUND $r spelled $tS%.2f s fused $tF%.2f s ratio ${tF / tS}%.2f eq=${a == b}")
    }
  }
}
