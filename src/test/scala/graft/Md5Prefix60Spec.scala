package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused portable-hash kernel and its optimizer rule: bit-parity
  * with the spelled `cast(conv(substring(md5(x), 1, 15), 16, 10) as
  * bigint)` form (driver-golden, so the check is independent of the
  * rewrite), the rewrite itself appearing in optimized plans, and
  * null propagation. */
class Md5Prefix60Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bit-parity with the spelled hex-conv form on 1000 strings (driver golden)") {
    import spark.implicits._
    val inputs = (1 to 1000).map(i => s"doc-$i:salt")
    val got = inputs.toDF("s")
      .select(graft.Functions.md5prefix60(col("s").cast("binary")).as("h"))
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = inputs.map { s =>
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    assert(got.toSeq === want)
  }

  test("optimizer rule fuses the spelled form in every session plan") {
    // non-literal input — a literal constant-folds before the rule
    val df = spark.range(2).select(expr(
      "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint)")
      .as("h"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("md5prefix60"),
      s"spelled hash not fused by Md5PrefixFold:\n$opt")
    // and the fused plan computes the same values as the driver golden
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = Seq("0", "1").map { s =>
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    assert(df.collect().map(_.getLong(0)).toSeq === want)
  }

  test("null propagates; string input coerces via implicit cast in SQL") {
    import spark.implicits._
    val r = Seq(Some("x"), None).toDF("s")
      .selectExpr("md5prefix60(s) as h").collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
