package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_stats(t)` — token statistics of a NORMALIZED (trimmed,
  * single-spaced, `[a-z0-9 ]`) string in ONE byte pass + one set
  * insertion per token:
  *
  *   n_tokens    = split(t, ' ') length (spaces + 1 — the empty
  *                 string counts one empty token, exactly `split`)
  *   n_bpe       = matches of `[a-z]+|[0-9]` (letter runs count one
  *                 each, every digit counts one — the BPE-ish
  *                 subword split)
  *   n_types     = distinct tokens
  *   n_wordchars = non-space bytes
  *   max_tok     = longest token length
  *
  * Replaces a regexp_count + array_distinct + per-word HOF max over
  * the same data — each of those was its own interpreted pass. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("n_wordchars", LongType, nullable = false),
    StructField("max_tok", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  def stats(t: UTF8String): InternalRow = {
    val b = t.getBytes
    val n = b.length
    val types = new java.util.HashSet[UTF8String]()
    var tokens = 0L
    var bpe = 0L
    var wordchars = 0L
    var maxTok = 0L
    var start = 0
    var inLetterRun = false
    var i = 0
    while (i <= n) {
      val c = if (i < n) b(i) else ' '.toByte // virtual terminator
      if (c == ' ') {
        tokens += 1
        val len = i - start
        if (len > maxTok) maxTok = len
        types.add(UTF8String.fromBytes(b, start, len))
        start = i + 1
        inLetterRun = false
      } else {
        wordchars += 1
        if (c >= 'a' && c <= 'z') {
          if (!inLetterRun) { bpe += 1; inLetterRun = true }
        } else {
          inLetterRun = false
          if (c >= '0' && c <= '9') bpe += 1
        }
      }
      i += 1
    }
    val row = new GenericInternalRow(5)
    row.update(0, tokens)
    row.update(1, bpe)
    row.update(2, types.size().toLong)
    row.update(3, wordchars)
    row.update(4, maxTok)
    row
  }
}
