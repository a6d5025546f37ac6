package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Winnow

/** Winnowing kernel semantics: parity with a slow reference
  * implementation (per-position recomputed hashes, explicit per-window
  * argmin), the published detection guarantee (shared runs of
  * ≥ k+w−1 chars share a selected fingerprint), density, edge cases,
  * and the loud position-packing bound. */
class WinnowSpec extends AnyFunSuite {

  private val P = 2147483647L

  /** O(n·k) reference: recompute each k-gram hash from scratch, then
    * take each window's min packed value — the oracle SQL's shape. */
  private def slow(t: String, k: Int, w: Int): Seq[Long] = {
    val b = t.getBytes("UTF-8")
    val m = b.length - k + 1
    if (m <= 0) return Seq.empty
    val packed = (0 until m).map { p =>
      var h = 0L
      (p until p + k).foreach(i => h = (h * 31L + (b(i) & 0xff)) % P)
      (h << 21) + (1048575L - p)
    }
    (0 to math.max(m - w, 0)).map(j => packed.slice(j, j + w).min)
      .distinct.sorted
  }

  private def fast(t: String, k: Int, w: Int): Seq[Long] =
    Winnow.select(UTF8String.fromString(t), k, w).toLongArray().toSeq

  test("matches the slow reference on goldens and random strings") {
    assert(fast("", 8, 4) === Seq.empty)
    assert(fast("abcdefg", 8, 4) === Seq.empty)      // shorter than k
    assert(fast("abcdefgh", 8, 4) === slow("abcdefgh", 8, 4)) // single gram
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val t = (1 to n).map(_ => "abcdefgh0123 " (rnd.nextInt(13))).mkString
      (Seq((4, 2), (8, 4), (5, 7))).foreach { case (k, w) =>
        assert(fast(t, k, w) === slow(t, k, w), s"k=$k w=$w t=$t")
      }
    }
  }

  test("guarantee: a shared run of k+w-1 chars shares a fingerprint") {
    // the winnowing theorem: any common substring of length ≥ k+w−1
    // contains a full window, and both documents select that window's
    // minimum — position-independent because ties can't cross hashes
    // (h dominates the packing) and equal-hash selections decode to
    // the same fingerprint
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randStr(11) // k+w-1 = 8+4-1
    (1 to 50).foreach { _ =>
      val a = randStr(rnd.nextInt(100)) + shared + randStr(rnd.nextInt(100))
      val b = randStr(rnd.nextInt(100)) + shared + randStr(rnd.nextInt(100))
      val ha = fast(a, 8, 4).map(_ >> 21).toSet
      val hb = fast(b, 8, 4).map(_ >> 21).toSet
      assert(ha.intersect(hb).nonEmpty, s"no shared fingerprint: $a | $b")
    }
  }

  test("density: selections are ~2/(w+1) of k-grams on random text") {
    val rnd = new scala.util.Random(13)
    val t = (1 to 20000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val m = t.length - 8 + 1
    val density = fast(t, 8, 4).size.toDouble / m
    assert(density > 0.25 && density < 0.55, s"density $density") // 2/(w+1) = 0.4
  }

  test("rejects documents past the 2^20 position bound loudly") {
    val big = "a" * 1048576
    val e = intercept[IllegalArgumentException](fast(big, 8, 4))
    assert(e.getMessage.contains("chunk"))
  }
}
