package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_stats(t)` — the Gopher/C4-style repetition signals of a
  * NORMALIZED (trimmed, single-spaced) string in ONE pass:
  *
  *   n_words      = split(t, ' ') length (empty string counts one
  *                  empty word, exactly `split`)
  *   n_types      = distinct words
  *   top_word_n   = occurrences of the most frequent word
  *   top_bigram_n = occurrences of the most frequent adjacent word
  *                  pair (0 when fewer than two words)
  *
  * Duplicate-word fraction and top-n-gram fraction — the filters a
  * training-data pipeline gates templated/boilerplate text on — derive
  * from these as pure integer arithmetic, so the oracle surface stays
  * float-free. Map-only at any scale: the alternative explode +
  * groupBy(doc, word/bigram) + max formulation shuffles one row per
  * TOKEN (quadratic pain at 100 TB); this keeps the whole computation
  * inside the row's projection. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  private val SPACE = UTF8String.fromString(" ")

  def stats(t: UTF8String): InternalRow = {
    val b = t.getBytes
    val n = b.length
    // word/bigram tallies; UTF8String keys are zero-copy views over b
    val words = new java.util.HashMap[UTF8String, Integer]()
    val bigrams = new java.util.HashMap[UTF8String, Integer]()
    var nWords = 0L
    var topWord = 0
    var topBigram = 0
    var prev: UTF8String = null
    var start = 0
    var i = 0
    while (i <= n) {
      val c = if (i < n) b(i) else ' '.toByte // virtual terminator
      if (c == ' ') {
        val w = UTF8String.fromBytes(b, start, i - start)
        nWords += 1
        val cw = words.merge(w, 1, (x: Integer, y: Integer) => x + y)
        if (cw > topWord) topWord = cw
        if (prev != null) {
          val bg = UTF8String.concat(prev, SPACE, w)
          val cb = bigrams.merge(bg, 1, (x: Integer, y: Integer) => x + y)
          if (cb > topBigram) topBigram = cb
        }
        prev = w
        start = i + 1
      }
      i += 1
    }
    val row = new GenericInternalRow(4)
    row.update(0, nWords)
    row.update(1, words.size().toLong)
    row.update(2, topWord.toLong)
    row.update(3, topBigram.toLong)
    row
  }
}
