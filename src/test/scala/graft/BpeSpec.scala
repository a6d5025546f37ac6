package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vocab(rows: (String, Long)*) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("w", "freq")
  }

  private def tokensOf(syms: org.apache.spark.sql.DataFrame, w: String): Seq[String] =
    syms.filter(col("w") === w).orderBy("pos")
      .select("sym").collect().map(_.getString(0)).toSeq

  test("applyMerge is leftmost-greedy non-overlapping (the a=b run cases)") {
    val syms = Bpe.explodeSyms(vocab("aaaa" -> 1L, "aaa" -> 1L, "babab" -> 1L))
    val m = Bpe.applyMerge(syms, "a", "a")
    // even run: both pairs merge; odd run: trailing symbol survives
    assert(tokensOf(m, "aaaa") === Seq("aa", "aa"))
    assert(tokensOf(m, "aaa") === Seq("aa", "a"))
    // no (a,a) adjacency at all: untouched
    assert(tokensOf(m, "babab") === Seq("b", "a", "b", "a", "b"))

    val m2 = Bpe.applyMerge(syms, "a", "b")
    assert(tokensOf(m2, "babab") === Seq("b", "ab", "ab"))
  }

  test("merged symbols are atomic in later rounds") {
    // after merging (a,b), pair (ab, c) is countable and mergeable,
    // and single-char (b, c) adjacency inside "ab c" must NOT match
    val syms = Bpe.applyMerge(
      Bpe.explodeSyms(vocab("abc" -> 1L, "xbc" -> 1L)), "a", "b")
    assert(tokensOf(syms, "abc") === Seq("ab", "c"))
    val pairs = Bpe.pairCounts(syms).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("ab", "c")) === 1L)
    assert(pairs(("b", "c")) === 1L) // from "xbc" only
    val m = Bpe.applyMerge(syms, "b", "c")
    assert(tokensOf(m, "abc") === Seq("ab", "c"), "b inside ab must not re-match")
    assert(tokensOf(m, "xbc") === Seq("x", "bc"))
  }

  test("pairCounts weights by word frequency and counts overlaps") {
    val pairs = Bpe.pairCounts(Bpe.explodeSyms(vocab("aaa" -> 2L, "ab" -> 3L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("a", "a")) === 4L) // two overlapping (a,a) per "aaa", freq 2
    assert(pairs(("a", "b")) === 3L)
  }

  test("train is deterministic under repartitioning and picks the argmax") {
    val v = vocab("the" -> 10L, "then" -> 5L, "ox" -> 7L)
    val (m1, toks1) = Bpe.train(v, 3)
    val (m2, toks2) = Bpe.train(v.repartition(7, col("w")), 3)
    assert(m1 === m2, "merge rules must not depend on partitioning")
    // round 1: (h,e) and (t,h) tie at 15 → lhs ASC picks (h,e);
    // round 2: (t,he) 15; round 3: (o,x) 7 beats (the,n) 5
    assert(m1.map(m => (m.lhs, m.rhs, m.n)) ===
      Seq(("h", "e", 15L), ("t", "he", 15L), ("o", "x", 7L)))
    val t1 = toks1.orderBy("w", "pos").select("w", "sym").collect().map(_.toSeq).toSeq
    val t2 = toks2.orderBy("w", "pos").select("w", "sym").collect().map(_.toSeq).toSeq
    assert(t1 === t2)
    assert(tokensOf(toks1, "the") === Seq("the"))
    assert(tokensOf(toks1, "then") === Seq("the", "n"))
  }

  test("applyMerge plan: ONE (w, pos) sort per round — trailing renumber/lookahead window rides the first sort's order") {
    val syms = Bpe.explodeSyms(vocab("aaaa" -> 1L, "babab" -> 2L))
    // nxt attached (the train-loop shape): the merge's selection
    // window needs one sort; the final row_number+lead window must
    // reuse that order (filter/project preserve it), adding none
    val plan = Bpe.applyMerge(syms, "a", "a").queryExecution.executedPlan.toString
    val sorts = "(?m)^\\s*[+:*-]*\\s*Sort ".r.findAllIn(plan).length
    assert(sorts === 1, s"expected exactly 1 Sort in applyMerge plan, got $sorts:\n$plan")
  }

  test("train stops early when no pairs remain") {
    val (m, toks) = Bpe.train(vocab("ab" -> 1L), 5)
    assert(m.map(x => (x.lhs, x.rhs, x.n)) === Seq(("a", "b", 1L)))
    assert(tokensOf(toks, "ab") === Seq("ab"))
  }
}
