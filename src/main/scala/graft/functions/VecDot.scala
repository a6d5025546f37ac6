package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)` — sequential-fold dot product of two numeric
  * arrays (float or double elements), the embedding-similarity hot
  * path (q16/q22/q23 compute one per candidate PAIR).
  *
  * Numerically identical to the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x,y) -> cast(x as double)*cast(y as
  * double)), 0d, (acc,v) -> acc+v)`) and to the DuckDB oracle's
  * `list_sum(list_transform(...))`: every element is widened to
  * double, products are accumulated strictly left-to-right — the same
  * IEEE op sequence, so results stay bit-identical. NULL semantics
  * also match the HOF chain: length mismatch or any NULL element
  * poisons the result to NULL.
  *
  * Why native: Catalyst evaluates higher-order functions one lambda
  * call per element per row — measured ~6× slower end-to-end on the
  * bucketed near-dup join at sf0.1, where the dot dominates the
  * per-pair cost. This compiles to a tight static-call loop inside
  * whole-stage codegen.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull}) {
          Double tmp = graft.functions.VecDot.compute(
            ${l.value}, ${r.value}, ${isFloat(left)}, ${isFloat(right)});
          if (tmp != null) { ${ev.isNull} = false; ${ev.value} = tmp.doubleValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Strict sequential fold; null on length mismatch or null element
    * (the zip_with/aggregate poisoning semantics). Boxed return so
    * codegen can branch on null. */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
