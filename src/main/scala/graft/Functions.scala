package graft

import org.apache.spark.sql.SparkSession

/** SQL function registration hook (filled in as custom Catalyst
  * expressions land: uuid_str, envelope_json, cosine_sim, ...). */
object Functions {
  def register(spark: SparkSession): Unit = ()
}
