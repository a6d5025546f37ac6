package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_intersect_count(a, b)` — |A ∩ B| for two SORTED string or
  * int arrays via a single merge walk: O(|a|+|b|) comparisons, zero
  * allocation, fully codegen-able.
  *
  * Built for the near-dup Jaccard operators: Spark's `array_intersect`
  * builds a hash set and an output array per invocation, which at one
  * call per candidate PAIR dominates the whole query (measured ~40 s
  * for 120k pairs × ~1.2k-element arrays at sf0.1). The merge walk on
  * pre-sorted inputs (`array_sort` once per DOC, not per pair) removes
  * both the hashing and the allocation from the pair loop.
  *
  * Inputs MUST be sorted ascending and duplicate-free (use
  * `array_sort(array_distinct(...))`); the result is the set
  * intersection size. Null elements are not supported (callers build
  * arrays from `transform`, which yields none).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires matching (ARRAY<STRING>, ARRAY<STRING>) " +
        s"or (ARRAY<INT>, ARRAY<INT>), got (${l.simpleString}, ${r.simpleString})")
  }

  private def intElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (intElems)
      SortedIntersectCount.countInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (intElems) "countInt" else "count"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.$method($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Primitive-int variant for packed gram codes ([[Gram4Codes]]):
    * the pair loop is two int loads and a compare per step. */
  def countInt(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
