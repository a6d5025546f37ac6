package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bow_counts(t, n)` — the hashed bag-of-words count vector of a
  * NORMALIZED single-spaced string: one pass over the bytes, each
  * space-delimited token bucketed by its md5-prefix hash
  * (`conv(substring(md5(w), 1, 15), 16, 10) % n` — the shared
  * oracle-replayable hash domain, computed here straight from the
  * digest bytes: 15 hex digits = the first 7.5 bytes big-endian),
  * counts returned as an `array<long>` of length `n`.
  *
  * Replaces the `transform(sequence(0, n-1), k -> size(filter(words,
  * w -> pmod(conv(substring(md5(w), 1, 15), 16, 10), n) = k)))` HOF
  * chain (q107's featurize), which paid an interpreted lambda frame,
  * a 32-char hex string, a substring and a string-parse PER WORD PER
  * LANE. Split semantics mirror Spark's `split(t, ' ')` exactly —
  * an empty string yields one empty token (md5 of "") — so the
  * DuckDB `string_split` replay sees identical tokens.
  */
case class BowCounts(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 1 && buckets <= 4096,
    s"bow_counts: buckets must be in [1, 4096], got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bow_counts requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bow_counts"

  override protected def nullSafeEval(input: Any): Any =
    BowCounts.counts(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BowCounts.counts($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): BowCounts =
    copy(child = newChild)
}

object BowCounts {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Bucket of one token: the integer value of the digest's first 15
    * hex digits (7 bytes big-endian, plus the high nibble of byte 7),
    * mod `n`. Non-negative by construction (< 2^60). */
  def bucket(bytes: Array[Byte], off: Int, len: Int, n: Int): Int = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(7) >> 4) & 0xfL)
    (v % n).toInt
  }

  def counts(t: UTF8String, n: Int): ArrayData = {
    val out = new Array[Long](n)
    val b = t.getBytes
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        out(bucket(b, start, i - start, n)) += 1L
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
