package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries summary semantics: the capacity bound, the
  * heavy-hitter superset guarantee under arbitrary partitioning
  * (merge trees), and q54's exact equality with the brute-force
  * heavy-hitters query. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** zipf-ish stream: item i appears ~n/(i+1) times, shuffled. */
  private def stream(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val items = (0 until 50).flatMap(i => Seq.fill(n / (i + 1))(s"w$i"))
    rnd.shuffle(items)
  }

  private def sketch(xs: Seq[String], cap: Int, parts: Int): Seq[String] = {
    import spark.implicits._
    xs.toDF("w").repartition(parts)
      .agg(Functions.misra_gries(col("w"), cap).as("c"))
      .collect()(0).getSeq[String](0)
  }

  test("output is capacity-bounded and sorted") {
    val out = sketch(stream(2000, 1), 10, 8)
    assert(out.size <= 10)
    assert(out == out.sorted)
  }

  test("superset guarantee holds across partitionings") {
    val xs = stream(3000, 2)
    val n = xs.size
    val exact = xs.groupBy(identity).view.mapValues(_.size).toMap
    for (cap <- Seq(20, 100); parts <- Seq(1, 7, 32)) {
      val cands = sketch(xs, cap, parts).toSet
      val mustHave = exact.collect {
        case (w, c) if c.toLong * (cap + 1) > n => w
      }
      mustHave.foreach { w =>
        assert(cands.contains(w),
          s"item $w (freq ${exact(w)}, n=$n, cap=$cap, parts=$parts) missing")
      }
    }
  }

  test("q54 equals the brute-force exact heavy-hitters query") {
    val got = SparkEntry.queries("q54_heavy")(spark, sf)
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")).as("word"))
      .filter(col("word") =!= "")
    val total = words.count()
    val want = words.groupBy("word").agg(count(lit(1)).as("n_word"))
      .filter(col("n_word") * 1000 > total)
      .orderBy("word")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("grouped aggregation keeps the per-group guarantee") {
    import spark.implicits._
    // two groups with different dominant items, shuffled together
    val rnd = new scala.util.Random(3)
    val a = Seq.fill(300)("hot_a") ++ (1 to 300).map(i => s"a$i")
    val b = Seq.fill(400)("hot_b") ++ (1 to 200).map(i => s"b$i")
    val rows = rnd.shuffle(a.map(("ga", _)) ++ b.map(("gb", _)))
    val out = rows.toDF("g", "w").repartition(16)
      .groupBy("g")
      .agg(Functions.misra_gries(col("w"), 50).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out("ga").contains("hot_a") && out.keySet === Set("ga", "gb"))
    assert(out("gb").contains("hot_b"))
    assert(out("ga").size <= 50 && out("gb").size <= 50)
  }

  test("SQL name registered with literal capacity") {
    GraftSession(spark)
    import spark.implicits._
    Seq("a", "a", "b").toDF("w").createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT misra_gries(w, 10) FROM mg_in")
      .collect()(0).getSeq[String](0)
    assert(out === Seq("a", "b"))
  }
}
