package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `centroid_topk(emb, codebook, k)` — the ids of the `k` codebook
  * centroids with the largest dot product against `emb`, ordered by
  * (dot desc, cid asc). The IVF coarse-quantizer assignment kernel:
  * `codebook` is an `ARRAY<STRUCT<cid BIGINT, cv ARRAY<FLOAT|DOUBLE>>>`
  * column produced by `collect_list` over the (small) centroid set and
  * broadcast to every corpus partition, so assignment is MAP-ONLY —
  * one expression call per row, no expanded n×K rows, no window, no
  * shuffle of the corpus (the shape a `crossJoin` + `row_number()`
  * window forces: a full hash shuffle keyed on a per-row-unique id
  * just to compute an argmax).
  *
  * Dots use the exact [[VecDot.compute]] sequential fold, so ranking
  * is bit-identical to the oracle's windowed `ORDER BY cd DESC, cid
  * ASC` formulation. NULL semantics: any NULL input, NULL codebook
  * entry, or length-mismatched vector poisons the result to NULL.
  * Fewer than `k` centroids returns them all.
  */
case class CentroidTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case _ if k < 1 =>
      TypeCheckResult.TypeCheckFailure(s"centroid_topk k must be >= 1, got $k")
    case (e, ArrayType(StructType(Array(cid, cv)), _))
        if vecOk(e) && cid.dataType == LongType && vecOk(cv.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "centroid_topk requires (ARRAY<FLOAT|DOUBLE>, " +
        "ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_topk"

  @transient private lazy val embFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cvFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  def compute(embRaw: Any, cbRaw: Any): ArrayData = {
    val emb = embRaw.asInstanceOf[ArrayData]
    val cb = cbRaw.asInstanceOf[ArrayData]
    val n = cb.numElements()
    val dots = new Array[Double](n)
    val cids = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (cb.isNullAt(i)) return null
      val entry = cb.getStruct(i, 2)
      if (entry.isNullAt(0) || entry.isNullAt(1)) return null
      val d = VecDot.compute(emb, entry.getArray(1), embFloat, cvFloat)
      if (d == null) return null
      dots(i) = d
      cids(i) = entry.getLong(0)
      i += 1
    }
    // Partial selection: k is tiny (1-2 for assignment/probing), K is
    // the codebook size — O(k·K) beats building a heap for these sizes.
    val kk = math.min(k, n)
    val out = new Array[Long](kk)
    val used = new Array[Boolean](n)
    var r = 0
    while (r < kk) {
      var best = -1
      var j = 0
      while (j < n) {
        if (!used(j) && (best < 0 || dots(j) > dots(best) ||
            (dots(j) == dots(best) && cids(j) < cids(best)))) best = j
        j += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(emb: Any, cb: Any): Any = compute(emb, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTopK", this, classOf[CentroidTopK].getName)
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
      newLeft: Expression, newRight: Expression): CentroidTopK =
    copy(left = newLeft, right = newRight)
}
