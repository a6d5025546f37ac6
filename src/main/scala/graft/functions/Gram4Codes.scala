package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `gram4_codes(t)` — the sorted distinct character-4-gram set of a
  * NORMALIZED (ASCII `[a-z0-9 ]`) string, each gram packed big-endian
  * into one Int.
  *
  * The packing is bijective for 4 ASCII bytes and order-preserving
  * (big-endian non-negative bytes ⇒ int order == lexicographic gram
  * order), so set sizes and intersection counts are identical to the
  * string formulation the DuckDB oracle runs — only the
  * representation changes.
  *
  * Why native: the HOF chain it replaces
  * (`array_sort(array_distinct(transform(sequence(...), i ->
  * substring(t, i, 4))))`) allocates one UTF8String per gram and
  * TimSorts objects per document — measured ~5 s of the q21 wall at
  * sf0.1 just building gram sets. This is one byte pass + one
  * primitive-int sort + in-place dedup, and downstream
  * `sorted_intersect_count` walks int arrays (two loads + compare per
  * step) instead of byte strings. Per-doc output is 4 bytes per gram
  * instead of ~20 — the shuffle payload of the near-dup join shrinks
  * 5× at any scale.
  */
case class Gram4Codes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram4_codes requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram4_codes"

  override protected def nullSafeEval(input: Any): Any =
    Gram4Codes.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Gram4Codes.codes($c)")

  override protected def withNewChildInternal(newChild: Expression): Gram4Codes =
    copy(child = newChild)
}

object Gram4Codes {
  private val empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)

  def codes(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length - 3
    if (n <= 0) return empty
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) {
      arr(i) = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == n) arr else java.util.Arrays.copyOf(arr, w))
  }
}
