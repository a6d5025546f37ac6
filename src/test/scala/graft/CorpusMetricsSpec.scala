package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-9 corpus metrics: DSIR importance
  * weights (q120), bigram type-token diversity (q121), and the mixed
  * grouping-sets aggregation (q122) — each checked against a
  * brute-force driver-side recomputation on sf0.001. */
class CorpusMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def norm(t: String): Array[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ", -1)

  private def docs(): Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q120: target docs excluded; weights match a driver-side replay") {
    val all = docs()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Int = {
      val hex = md.digest(w.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 64L).toInt
    }
    val toks = all.flatMap { case (id, src, t) => norm(t).map(w => (id, src, bucket(w))) }
    val ct = Array.fill(64)(0L); val cr = Array.fill(64)(0L)
    toks.foreach { case (_, src, b) => if (src == "src0") ct(b) += 1 else cr(b) += 1 }
    val (tt, tr) = (ct.sum, cr.sum)
    def lg(x: Long) = java.lang.Long.toBinaryString(x).length
    val s = (0 until 64).map(b => (lg(ct(b) + 1) - lg(cr(b) + 1) + (lg(tr) - lg(tt))).toLong)
    val want = toks.filter(_._2 != "src0").groupBy(_._1).view
      .mapValues(ts => (ts.size.toLong, ts.map(t => s(t._3)).sum)).toMap
    val got = SparkEntry.queries("q120_dsir")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.keySet.intersect(
      all.filter(_._2 == "src0").map(_._1).toSet).isEmpty)
  }

  test("q121: ttr bounds and one-source brute force") {
    val rows = SparkEntry.queries("q121_diversity")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: distinct > total")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000)
    }
    val src = rows.head.getString(0)
    val bgs = docs().filter(_._2 == src).flatMap { case (_, _, t) =>
      val w = norm(t); if (w.length < 2) Nil else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val r = rows.find(_.getString(0) == src).get
    assert(r.getLong(1) == bgs.size.toLong)
    assert(r.getLong(2) == bgs.distinct.size.toLong)
  }

  test("q126: band candidates imply >= 2 matching components; threshold slice = q18") {
    val rows = SparkEntry.queries("q126_minhash_est")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (a, b, est12, estPpm, jacPpm) =>
      assert(est12 >= 2, s"($a,$b): band collision with <2 matching components")
      assert(estPpm == est12 * 1000000 / 12)
      assert(jacPpm >= 0 && jacPpm <= 1000000)
    }
    val confirmed = rows.filter { case (_, _, _, _, jac) => jac * 5 >= 3000000 }
      .map(t => (t._1, t._2)).toSet
    val q18 = SparkEntry.queries("q18_minhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(confirmed == q18, "threshold slice of the audit != q18's pair set")
  }

  test("q127: deciles are balanced within each language and ordered by score") {
    val rows = SparkEntry.queries("q127_deciles")(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$lang deciles unbalanced: $sizes")
      // min score of decile d >= max score of decile d+1
      val byDecile = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      (1L until 10L).foreach { d =>
        for (hi <- byDecile.get(d); lo <- byDecile.get(d + 1))
          assert(hi.min >= lo.max, s"$lang decile $d overlaps ${d + 1}")
      }
    }
  }

  test("q128: per-lang samples capped at 20 with weight-proportional inclusion") {
    val rows = SparkEntry.queries("q128_wsample")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length <= 20, s"$lang sampled ${rs.length} > 20")
      // priorities are the claimed function of (u, w) and ranks are 1..n
      rs.foreach { case (_, w, u, k, _) => assert(k == u * 1000000000000L / w) }
      assert(rs.map(_._5).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // size bias: sampled docs are larger on average than the corpus
    val sampled = rows.map(_._2)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampled.sum.toDouble / sampled.length > corpusMean,
      "size-weighted sample is not size-biased")
  }

  test("q129: statuses partition the snapshot union and match set arithmetic") {
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val old = ids.filter(_ % 7 != 0); val neu = ids.filter(_ % 5 != 0)
    val byStatus = SparkEntry.queries("q129_snapshot_diff")(spark, sf).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byStatus("added") == (neu -- old).size.toLong)
    assert(byStatus("removed") == (old -- neu).size.toLong)
    assert(byStatus("changed") == (old & neu).count(_ % 11 == 0).toLong)
    assert(byStatus.values.sum == (old | neu).size.toLong)
  }

  test("q131: sketch totals match q121 exactly; estimates land near exact distincts") {
    val exact = SparkEntry.queries("q121_diversity")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sk = SparkEntry.queries("q131_diversity_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(sk.map(_._1).toSet == exact.keySet)
    sk.foreach { case (src, nb, est) =>
      assert(nb == exact(src)._1, s"$src: occurrence totals diverge")
      val d = exact(src)._2.toDouble
      assert(est > d * 0.6 && est < d * 1.6,
        s"$src: HLL estimate $est too far from exact $d")
    }
  }

  test("q134: top-3 continuations are count-ordered and head totals are complete") {
    val rows = SparkEntry.queries("q134_nextword")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bigrams = docs().flatMap { case (_, _, t) =>
      val w = norm(t); if (w.length < 2) Nil else w.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val cnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val headTot = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (w1, rs) =>
      assert(headTot(w1) >= 50 && rs.forall(_._4 == headTot(w1)))
      assert(rs.map(_._5).sorted.toSeq == (1L to rs.length).toSeq)
      val ns = rs.sortBy(_._5).map(_._3)
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
      rs.foreach { case (_, w2, n, _, _) => assert(cnt((w1, w2)) == n) }
    }
  }

  test("q135: PMI integers match the floor-log2 formula on emitted counts") {
    def lg(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    val rows = SparkEntry.queries("q135_pmi")(spark, sf).collect()
    assert(rows.length <= 30 && rows.nonEmpty)
    // recompute N from the corpus
    val nn = docs().map { case (_, _, t) =>
      math.max(0, norm(t).length - 1).toLong
    }.sum
    rows.foreach { r =>
      val (nxy, cx, cy, pmi) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nxy >= 20)
      assert(pmi == lg(nxy * nn) - lg(cx * cy))
    }
  }

  test("q122: grand total, set partitions, and detail rows agree") {
    val rows = SparkEntry.queries("q122_gsets")(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val grand = rows.filter(r => r.getLong(3) == 1 && r.getLong(4) == 1 && r.getLong(5) == 1)
    assert(grand.length == 1 && grand.head.getLong(6) == total)
    // each grouping set's counts partition the table
    val detail = rows.filter(r => r.getLong(3) == 0 && r.getLong(4) == 0)
    val byYear = rows.filter(r => r.getLong(3) == 1 && r.getLong(5) == 0)
    assert(detail.map(_.getLong(6)).sum == total)
    assert(byYear.map(_.getLong(6)).sum == total)
    // detail rows equal a plain groupBy
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    detail.foreach { r =>
      assert(want((r.getString(0), r.getString(1))) == r.getLong(6))
    }
  }

  private def sourceTermCounts(): Map[(String, String), Long] =
    docs().flatMap { case (_, src, t) => norm(t).filter(_.nonEmpty).map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("q265: top-10 keyness rows match an exact BigInt replay") {
    val c = sourceTermCounts()
    val ts = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val g = c.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tot = c.values.sum
    val v = g.size.toLong
    val want = c.toSeq.map { case ((src, term), a) =>
      val b = g(term) - a
      val k = (BigInt(a + 1) * BigInt(tot - ts(src) + v) * 1000000) /
        (BigInt(b + 1) * BigInt(ts(src) + v))
      (src, term, a, b, k.toLong)
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._5, r._2)).zipWithIndex.take(10)
        .map { case ((src, term, a, b, k), i) => (src, term, a, b, k, i + 1L) }
    }.toSet
    val got = SparkEntry.queries("q265_keyness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("q266: slope matches the integer least-squares replay and is negative") {
    def lg2(x: Long) = java.lang.Long.toBinaryString(x).length - 1L
    // lang isn't in docs()'s projection — re-read with the lang column
    val rows = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = rows.flatMap { case (lang, t) =>
      norm(t).filter(_.nonEmpty).map(lang -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.groupBy(_._1._1).map { case (lang, m) =>
      val ranked = m.toSeq.map { case ((_, term), cnt) => (term, cnt) }
        .sortBy { case (term, cnt) => (-cnt, term) }.zipWithIndex
        .map { case ((_, cnt), i) => (lg2(i + 1L), lg2(cnt)) }
      val n = BigInt(ranked.size)
      val sx = ranked.map(r => BigInt(r._1)).sum
      val sy = ranked.map(r => BigInt(r._2)).sum
      val sxy = ranked.map(r => BigInt(r._1) * BigInt(r._2)).sum
      val sxx = ranked.map(r => BigInt(r._1) * BigInt(r._1)).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope = if (num >= 0) (num * 1000000) / den
        else -((-num * 1000000) / den)
      lang -> (ranked.size.toLong, sy.toLong, slope.toLong)
    }
    val got = SparkEntry.queries("q266_zipf")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    got.values.foreach { case (_, _, slope) =>
      assert(slope < 0, "zipf slope must be negative on a natural rank curve")
    }
  }

  test("q267: tvd matches the exact distribution distance and its bounds") {
    val c = sourceTermCounts()
    val ts = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val srcs = ts.keys.toSeq.sorted
    val terms = c.keys.map(_._2).toSet
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
    } yield {
      val (ta, tb) = (BigInt(ts(a)), BigInt(ts(b)))
      val num = terms.toSeq.map { t =>
        (BigInt(c.getOrElse((a, t), 0L)) * tb -
          BigInt(c.getOrElse((b, t), 0L)) * ta).abs
      }.sum
      (a, b) -> ((num * 1000000) / (2 * ta * tb)).toLong
    }).toMap
    val got = SparkEntry.queries("q267_tvd")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.size == srcs.size * (srcs.size - 1) / 2,
      "every ordered source pair must appear, shared terms or not")
    got.values.foreach(v => assert(v >= 0 && v <= 1000000))
  }
}
