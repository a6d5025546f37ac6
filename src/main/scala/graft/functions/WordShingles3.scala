package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles3(t)` — the sorted distinct 3-word shingle set of a
  * NORMALIZED (trimmed, single-spaced, `[a-z0-9 ]`) string.
  *
  * Because the input is single-spaced, every 3-word shingle is a
  * CONTIGUOUS substring of `t` (from word i's first byte to word
  * i+2's last byte), so shingles are built as byte-range slices of
  * the one input buffer — byte-identical to the
  * `transform(sequence(...), i -> array_join(slice(words, i, 3), ' '))`
  * HOF chain the DuckDB oracle mirrors (same strings ⇒ same md5-based
  * minhash domain), without allocating a word array, a lambda frame
  * per shingle, or an object TimSort per document: one boundary scan,
  * one slice array, one sort, adjacent dedup.
  *
  * Fewer than 3 words → empty array (callers filter on
  * `size(...) >= 1`, the same row set as the oracle's
  * `len(words) >= 3`).
  */
case class WordShingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles3 requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles3.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles3.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles3 =
    copy(child = newChild)
}

object WordShingles3 {
  def shingles(t: UTF8String): ArrayData = WordShinglesK.shingles(t, 3)
}
