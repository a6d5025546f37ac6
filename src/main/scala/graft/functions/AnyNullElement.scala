package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `any_null(arr)` — true iff the array contains a NULL element; the
  * native form of `exists(arr, x -> isnull(x))`, the embedding-table
  * pre-filter that fronts every similarity query.
  *
  * Identical semantics to the HOF (NULL array → NULL, no element
  * access beyond the null bit), but `exists` is a higher-order
  * function: Catalyst evaluates it via one interpreted lambda call per
  * element per row — d boxed invocations on EVERY corpus row before
  * the query proper starts, and a CodegenFallback island inside the
  * scan filter's whole-stage-codegen. This is one null-bitmap sweep
  * behind a codegen'd static call.
  */
case class AnyNullElement(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"any_null requires ARRAY, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "any_null"

  def compute(arrRaw: Any): Boolean = {
    val arr = arrRaw.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(arr: Any): Any = compute(arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anyNull", this, classOf[AnyNullElement].getName)
    defineCodeGen(ctx, ev, arr => s"$ref.compute($arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): AnyNullElement =
    copy(child = newChild)
}
