package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `kmeans_assign(vec)` — exact-integer argmin assignment of an int8
  * (long-element) vector against a plan-time codebook: the native form
  * of [[graft.ops.KMeans.assignExpr]]'s `least(struct(d, cid)…)` tower.
  *
  * Arithmetic is IDENTICAL to the Column formulation it replaces: per
  * centroid (sums S, count c), num = c²·(x·x) − 2c·(x·S) + (S·S) in
  * wrapping Long (the caller's construction-time bound keeps it
  * exact), d = num.toDouble / (c²).toDouble — one IEEE division of
  * exact integers — and the argmin orders by (d, cid) with
  * `java.lang.Double.compare` over centroids pre-sorted by cid (ties
  * → smaller cid), which is `least`'s struct order on this domain (no
  * NaN: c > 0; no −0.0: a Long cast). NULL semantics DIVERGE from the
  * Column form on bad inputs: this kernel returns NULL on a NULL
  * vector, NULL element, or length mismatch, whereas the old
  * least(struct(d, cid)) tower returned the SMALLEST cid there (its
  * dots poison to NULL, and nulls-first struct ordering makes least
  * pick the lowest-cid struct) for k > 1. Parity therefore holds only
  * under the caller convention that NULL vectors/elements are
  * pre-filtered — true of every current caller, and KMeansSpec pins
  * parity on that (filtered) real data. A future unfiltered caller
  * gets NULL, the intended contract, not the old accident.
  *
  * Why native: the `least` tower allocates k (double, long) structs
  * per ROW and re-reads the vector per centroid through generated
  * `vec_dot_int` calls; at k = 64 (the kForBudget cap) that measured
  * ~40 µs/row — structs and dispatch, not arithmetic. This kernel
  * hoists the per-centroid constants (c², 2c, S·S) to construction
  * time and runs one tight k×d loop per row behind a static call.
  * The codebook stays a broadcast-sized plan literal (k·d longs), the
  * same 100 TB contract as assignExpr.
  */
case class KmeansAssign(child: Expression,
    cids: Seq[Long], sums: Seq[Seq[Long]], counts: Seq[Long])
    extends UnaryExpression {

  require(cids.nonEmpty && cids.length == sums.length
    && cids.length == counts.length, "kmeans_assign: ragged codebook")
  require(cids == cids.sorted, "kmeans_assign: codebook must be cid-sorted")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmeans_assign requires ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_assign"

  @transient private lazy val k = cids.length
  @transient private lazy val dim = sums.head.length
  @transient private lazy val cidArr = cids.toArray
  @transient private lazy val sumArr: Array[Array[Long]] = sums.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Long] = counts.map(c => c * c).toArray
  @transient private lazy val twoCArr: Array[Long] = counts.map(c => 2L * c).toArray
  @transient private lazy val ssArr: Array[Long] =
    sums.map(_.map(s => s * s).sum).toArray

  // Partial-distance elimination was tried and MEASURED OUT here
  // (r16): accumulating num as Σ_j (c·x_j − S_j)² is the same integer
  // (ring identity) and monotone in j, so an exact early-exit against
  // bestD is provably bit-identical — but the 2-mul inner loop plus a
  // branch every 8 elements defeats auto-vectorization of this plain
  // dot loop, and the interleaved sf10 A/B came back 1.3-1.6× SLOWER
  // (q130 4.0 → 6.4 s, q111 4.1 → 5.0 s; BENCH_LOCAL_ab_r16_pde.json).
  // Keep the branch-free k×d form.
  def compute(vecRaw: Any): Any = {
    val vec = vecRaw.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) return null
    val x = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      x(j) = vec.getLong(j)
      j += 1
    }
    var xx = 0L
    j = 0
    while (j < dim) { xx += x(j) * x(j); j += 1 }
    var bestD = 0.0
    var bestCid = 0L
    var first = true
    var c = 0
    while (c < k) {
      val s = sumArr(c)
      var xs = 0L
      j = 0
      while (j < dim) { xs += x(j) * s(j); j += 1 }
      val num = ccArr(c) * xx - twoCArr(c) * xs + ssArr(c)
      val d = num.toDouble / ccArr(c).toDouble
      if (first || java.lang.Double.compare(d, bestD) < 0) {
        bestD = d; bestCid = cidArr(c); first = false
      }
      c += 1
    }
    java.lang.Long.valueOf(bestCid)
  }

  override protected def nullSafeEval(vec: Any): Any = compute(vec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmeansAssign", this, classOf[KmeansAssign].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          Object tmp = $ref.compute(${c.value});
          if (tmp != null) { ${ev.isNull} = false; ${ev.value} = ((java.lang.Long) tmp).longValue(); }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): KmeansAssign =
    copy(child = newChild)
}
