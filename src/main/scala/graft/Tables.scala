package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the driver testdata tables.
  *
  * `events` is the batch surrogate of the reference's firehose stream
  * (rakutentech/kafka-firehose-nozzle: the `<-chan *events.Envelope`
  * source, vendor/github.com/rakutentech/go-nozzle/consumer.go:15-34).
  * Its parquet `ts` column is TIMESTAMP(NANOS); Spark has no ns
  * precision, so it loads as a long (ns since epoch, via
  * `nanosAsLong`) and we expose both the raw long (`ts_ns`) and a
  * micro-truncated TimestampType (`ts`) for windowing.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as TimestampType (micros, truncated from ns) and
    * `ts_ns` as the original nanosecond long.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session (the parquet `ts` column is TIMESTAMP(NANOS), which Spark
    * otherwise refuses). All engine entry points (GraftSession, Verify,
    * Bench) set it at session build time; accessors here are
    * side-effect-free. */
  def events(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

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
