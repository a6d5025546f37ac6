package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the driver testdata tables.
  *
  * `events` is the batch surrogate of the reference's firehose stream
  * (rakutentech/kafka-firehose-nozzle: the `<-chan *events.Envelope`
  * source, vendor/github.com/rakutentech/go-nozzle/consumer.go:15-34).
  * The driver has shipped its `ts` column in two physical layouts
  * across testdata generations — TIMESTAMP(NANOS) (which Spark loads
  * as a nanosecond long via `nanosAsLong`) and plain TIMESTAMP_MICROS
  * — so the accessor adapts on schema, and every query downstream
  * sees the same logical pair: `ts` (TimestampType, µs) and `ts_ns`
  * (long nanoseconds; µs·1000 when the file has only µs precision,
  * matching DuckDB's `epoch_ns(ts)` on the same file).
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as TimestampType (micros) and `ts_ns` as a
    * nanosecond long, whichever physical layout the parquet uses.
    *
    * Session still sets `spark.sql.legacy.parquet.nanosAsLong=true`
    * (GraftSession, Verify, Bench) so the TIMESTAMP(NANOS) layout
    * loads instead of erroring; it is a no-op on the µs layout.
    * Accessors here are side-effect-free. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) via nanosAsLong
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _: org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // Naive µs timestamps: the session TZ is pinned to UTC
        // (GraftSession), so the cast re-tags the same instant and
        // unix_micros is exactly what DuckDB's epoch_us reads from the
        // same file.
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (expected long ns or timestamp µs)")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
