package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AcAutomaton

/** Aho-Corasick kernel semantics: occurrence counts at every start
  * position (overlaps included), verified against a brute-force
  * positional scan on adversarial and random inputs — the exact
  * contract the q99 oracle replays per pattern. */
class AcCountSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def brute(t: String, patterns: Seq[String]): Long =
    patterns.map { p =>
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length))
        .toLong.max(0L)
    }.sum

  private def ac(t: String, patterns: Seq[String]): Long =
    new AcAutomaton(patterns)
      .countMatches(org.apache.spark.unsafe.types.UTF8String.fromString(t))

  test("golden cases: overlaps, nesting, shared prefixes, fail chains") {
    assert(ac("aaa", Seq("a", "aa")) === 5L)           // 3 + 2
    assert(ac("ababab", Seq("ab", "ba", "aba")) === 7L) // 3 + 2 + 2
    assert(ac("scan the scanner", Seq("scan", "an", "ca")) === 6L)
    assert(ac("xyz", Seq("scan")) === 0L)
    assert(ac("", Seq("a")) === 0L)
    // pattern longer than text
    assert(ac("ab", Seq("abc")) === 0L)
    // duplicate pattern counts twice per occurrence (multiset dict)
    assert(ac("aa", Seq("a", "a")) === 4L)
  }

  test("matches brute force on 300 random texts over a nasty dictionary") {
    val dict = Seq("a", "aa", "ab", "aab", "baa", "bab", "abab")
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val t = (1 to rnd.nextInt(60)).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      assert(ac(t, dict) === brute(t, dict), s"mismatch on '$t'")
    }
  }

  test("count is independent of dictionary factoring into the automaton") {
    // one automaton over the union == sum of per-pattern automata
    val t = "the scandal scanned a vector join plan"
    val dict = Seq("scan", "an", "vector join", "plan")
    assert(ac(t, dict) === dict.map(p => ac(t, Seq(p))).sum)
  }

  test("empty or blank patterns are rejected") {
    intercept[IllegalArgumentException](new AcAutomaton(Seq.empty))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("a", "")))
  }

  test("expression evaluates over a DataFrame and via SQL, codegen-compatible") {
    import spark.implicits._
    Functions.register(spark)
    val df = Seq("banana band", "no hits here é").toDF("t")
    val viaApi = df.select(Functions.ac_count(col("t"), Seq("ban", "an")))
      .as[Long].collect().toSeq
    assert(viaApi === Seq(5L, 0L))
    df.createOrReplaceTempView("ac_in")
    val viaSql = spark.sql(
      "SELECT ac_count(t, array('ban', 'an')) FROM ac_in")
      .as[Long].collect().toSeq
    assert(viaSql === viaApi)
  }
}
