package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `pq_codes(emb, codebook, subDim)` — the product-quantization
  * encoding kernel: split `emb` into `emb.length / subDim` contiguous
  * subvectors and, for each, return the codebook cid whose
  * corresponding slice minimizes squared L2 distance (ties → smaller
  * cid). `codebook` is the same broadcast
  * `ARRAY<STRUCT<cid BIGINT, cv ARRAY<FLOAT|DOUBLE>>>` column shape
  * [[CentroidTopK]] consumes; each centroid's `cv` is sliced at the
  * same offsets as `emb`, so one call encodes every subspace in one
  * pass over the row.
  *
  * Numerically identical to the HOF formulation it replaces —
  * per subspace m:
  * `array_min(transform(cb, c -> struct(aggregate(zip_with(
  *    slice(emb, m*sub+1, sub), slice(c.cv, m*sub+1, sub),
  *    (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v) as d2,
  *  c.cid as cid))).cid`
  * — elements widen to double, squared differences accumulate strictly
  * left-to-right (the oracle's sequential fold), and the argmin orders
  * by (d2, cid) via `java.lang.Double.compare` (Spark's total order;
  * d2 ≥ 0 here, so the −0.0 corner cannot arise). NULL semantics
  * DIVERGE from the HOF form on bad inputs: this kernel poisons the
  * whole output array to NULL on NULL inputs, NULL elements, a NULL
  * codebook entry, or any length shortfall, whereas the old
  * array_min-over-structs returned a CID there (zip_with padding
  * yields a NULL d2, and null struct fields sort FIRST, so array_min
  * selects that struct's cid). Parity therefore holds only under the
  * caller convention that embeddings are pre-filtered for NULLs —
  * true of every current caller; PqCodesSpec pins parity on that
  * (filtered) real data and pins the intended NULL contract on
  * unfiltered input.
  *
  * Why native: Catalyst evaluates higher-order functions one lambda
  * call per element per row; the PQ encode is M·K·subDim lambda calls
  * per row (4·8·16 here) plus a struct allocation per centroid — the
  * dominant cost of q69/q70 at sf10 (measured ~19 s of a 19.2 s
  * query). This compiles to a tight loop behind one static call
  * inside whole-stage codegen.
  */
case class PqCodes(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case _ if subDim < 1 =>
      TypeCheckResult.TypeCheckFailure(s"pq_codes subDim must be >= 1, got $subDim")
    case (e, ArrayType(StructType(Array(cid, cv)), _))
        if vecOk(e) && cid.dataType == LongType && vecOk(cv.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "pq_codes requires (ARRAY<FLOAT|DOUBLE>, " +
        "ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  @transient private lazy val embFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cvFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def compute(embRaw: Any, cbRaw: Any): ArrayData = {
    val emb = embRaw.asInstanceOf[ArrayData]
    val cb = cbRaw.asInstanceOf[ArrayData]
    val dim = emb.numElements()
    if (dim == 0 || dim % subDim != 0) return null
    val m = dim / subDim
    val k = cb.numElements()
    if (k == 0) return null
    var i = 0
    while (i < dim) { if (emb.isNullAt(i)) return null; i += 1 }
    // decode the codebook once per call (k is broadcast-tiny)
    val cids = new Array[Long](k)
    val cvs = new Array[ArrayData](k)
    var c = 0
    while (c < k) {
      if (cb.isNullAt(c)) return null
      val entry = cb.getStruct(c, 2)
      if (entry.isNullAt(0) || entry.isNullAt(1)) return null
      cids(c) = entry.getLong(0)
      val cv = entry.getArray(1)
      if (cv.numElements() < dim) return null
      var j = 0
      while (j < dim) { if (cv.isNullAt(j)) return null; j += 1 }
      cvs(c) = cv
      c += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var bestD = 0.0
      var bestCid = 0L
      var first = true
      c = 0
      while (c < k) {
        val cv = cvs(c)
        var d2 = 0.0
        var j = 0
        while (j < subDim) {
          val x = elem(emb, off + j, embFloat)
          val y = elem(cv, off + j, cvFloat)
          val diff = x - y
          d2 += diff * diff
          j += 1
        }
        val cmp = java.lang.Double.compare(d2, bestD)
        if (first || cmp < 0 || (cmp == 0 && cids(c) < bestCid)) {
          bestD = d2; bestCid = cids(c); first = false
        }
        c += 1
      }
      out(s) = bestCid
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(emb: Any, cb: Any): Any = compute(emb, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${l.isNull} && !${r.isNull}) {
          ${ev.value} = $ref.compute(${l.value}, ${r.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}
