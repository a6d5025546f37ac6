package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_bounds(s, k, d)` — content-defined chunking boundaries: the
  * 1-based END positions i (k ≤ i ≤ len) where the 31-polynomial hash
  * of the k-byte window ending at i satisfies `h % d == 0`. The
  * storage/dedup-layer chunking primitive (LBFS/rsync lineage): cut
  * points ride the CONTENT, so an insertion early in a document
  * shifts at most one chunk instead of re-chunking everything after
  * it — which is what makes chunk-level dedup survive edits where
  * fixed 256-byte frames (q28/q162) do not.
  *
  * Window hash = the [[RollingHash]] polynomial over the window bytes
  * (`h = fold(h·31 + b) mod 2³¹−1`), recomputed per position — O(k)
  * per byte with k small (8 here), one native byte pass per document,
  * and byte-for-byte mirrorable in the oracle's list_reduce
  * formulation on normalized ASCII input. */
case class CdcBounds(child: Expression, k: Int, d: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && d >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires k >= 1 and d >= 1, got k=$k d=$d")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(input: Any): Any =
    CdcBounds.compute(input.asInstanceOf[UTF8String], k, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcBounds.compute($c, $k, $d)")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}

object CdcBounds {
  private val P = 2147483647L

  def compute(s: UTF8String, k: Int, d: Int): ArrayData = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = k
    while (i <= bytes.length) {
      var h = 0L
      var j = i - k
      while (j < i) { h = (h * 31 + (bytes(j) & 0xffL)) % P; j += 1 }
      if (h % d == 0) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
