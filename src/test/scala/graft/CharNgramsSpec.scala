package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `char_ngrams` is the engine's GENERATOR (UDTF) extension-tier
  * exhibit: it must emit exactly the rows the equivalent
  * posexplode(transform(sequence(...))) HOF chain emits — positions
  * included — through GenerateExec in BOTH the codegen and
  * interpreted paths, and register for SQL. */
class CharNgramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hofRows(s: String, n: Int): Seq[(Int, String)] =
    (0 to s.length - n).map(i => (i, s.substring(i, i + n)))

  test("matches the HOF posexplode form on random strings (positions included)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val alpha = "ab c0"
    val cases = Seq.fill(200)(
      (1 to rnd.nextInt(30)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString) ++
      Seq("", "a", "ab", "abc", "aaaa", "日本語テキスト") // incl. multi-byte
    for (n <- Seq(1, 2, 3, 5)) {
      val got = cases.toDF("t")
        .select(col("t"), Functions.char_ngrams(col("t"), n).as(Seq("pos", "gram")))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      val want = cases.flatMap(s => hofRows(s, n).map { case (p, g) => (s, p, g) }).toSet
      assert(got === want, s"n=$n mismatch")
    }
  }

  test("fewer than n chars emits no rows; null emits no rows") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Some("ab"), None, Some("abcd")).toDF("t")
    val rows = df.select(Functions.char_ngrams(col("t"), 3).as(Seq("pos", "gram")))
      .collect()
    assert(rows.map(_.getString(1)).toSeq.sorted === Seq("abc", "bcd"))
  }

  test("plans through GenerateExec inside whole-stage codegen") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("hello world").toDF("t")
      .select(Functions.char_ngrams(col("t"), 3).as(Seq("pos", "gram")))
    val p = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the whole-stage-codegen marker in the
    // short tree form — a non-codegen Generate prints bare
    assert(p.contains("*(1) Generate char_ngrams"),
      s"generator fell out of codegen:\n$p")
    assert(df.count() === 9)
  }

  test("SQL registration with LATERAL VIEW semantics") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT pos, gram FROM (SELECT 'abcd' AS t) LATERAL VIEW char_ngrams(t, 2) g AS pos, gram ORDER BY pos")
    assert(r.collect().map(x => (x.getInt(0), x.getString(1))).toSeq ===
      Seq((0, "ab"), (1, "bc"), (2, "cd")))
  }
}
