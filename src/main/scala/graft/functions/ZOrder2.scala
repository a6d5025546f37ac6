package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(a, b)` — Morton (Z-order) interleave of the low 31 bits of
  * two non-negative longs into one 62-bit clustering key: bit i of `a`
  * lands at position 2i, bit i of `b` at 2i+1.
  *
  * This is the DATA LAYOUT operator for 100 TB scans: sorting (or
  * `repartitionByRange`-ing) a table by `zorder2(x, y)` before the
  * parquet write co-locates rows that are close in BOTH dimensions, so
  * min/max page statistics prune scans for predicates on either column
  * — the standard lakehouse trick for multi-dimensional pruning where
  * a lexicographic sort only serves its leading column.
  *
  * Values are clamped into [0, 2^31) loudly (negative or oversized
  * inputs raise — a silently wrapped key would DE-cluster the layout).
  * The spread uses the classic mask-shift doubling, O(log bits) per
  * coordinate, fully codegen'd.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  private final val Max = (1L << 31) - 1

  /** Spread the low 31 bits of v to even positions (0, 2, 4, …, 60). */
  def spread(v: Long): Long = {
    var x = v & Max
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a > Max || b < 0 || b > Max)
      throw new IllegalArgumentException(
        s"zorder2 inputs must be in [0, 2^31), got ($a, $b) — " +
          "a wrapped key would de-cluster the layout; bucket or " +
          "offset the dimension first")
    spread(a) | (spread(b) << 1)
  }
}
