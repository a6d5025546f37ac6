package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `uuid_str(low, high)` — canonical dashed UUID string from a 128-bit
  * id stored as two 64-bit words, little-endian within each word.
  *
  * Semantics of the reference's `uuid2str`
  * (rakutentech/kafka-firehose-nozzle `kafka.go:214-219`): write `low`
  * into bytes 0..7 and `high` into bytes 8..15, each little-endian,
  * then hex-format the 16 bytes in 4-2-2-2-6 dashed groups. Golden:
  * UUID{low=0x7243cc580bc17af4, high=0x79d4c3b2020e67a5} →
  * "f47ac10b-58cc-4372-a567-0e02b2c3d479" (`kafka_test.go:542-555`).
  *
  * Codegen-able (stays inside whole-stage codegen): the generated code
  * calls the static [[UuidStr.format]] helper — one virtual-free call
  * per row, no boxing.
  */
case class UuidStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uuid_str requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "uuid_str"

  override protected def nullSafeEval(lo: Any, hi: Any): Any =
    UTF8String.fromString(
      UuidStr.format(lo.asInstanceOf[Long], hi.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, h) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UuidStr.format($l, $h))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UuidStr =
    copy(left = newLeft, right = newRight)
}

object UuidStr {
  private val HEX = "0123456789abcdef".toCharArray

  /** Little-endian 2×uint64 → dashed-hex UUID (groups 4-2-2-2-6 bytes). */
  def format(low: Long, high: Long): String = {
    val sb = new java.lang.StringBuilder(36)
    def word(w: Long, from: Int, until: Int): Unit = {
      var i = from
      while (i < until) {
        val b = ((w >>> (8 * i)) & 0xff).toInt
        sb.append(HEX(b >> 4)).append(HEX(b & 0xf))
        i += 1
      }
    }
    word(low, 0, 4); sb.append('-')
    word(low, 4, 6); sb.append('-')
    word(low, 6, 8); sb.append('-')
    word(high, 0, 2); sb.append('-')
    word(high, 2, 8)
    sb.toString
  }

  /** Inverse (reference `helper_test.go:17-24`): dashed UUID string →
    * (low, high) little-endian words. Test/tooling helper. */
  def parse(s: String): (Long, Long) = {
    val hex = s.replace("-", "")
    require(hex.length == 32, s"not a uuid: $s")
    def word(off: Int): Long = {
      var w = 0L
      var i = 0
      while (i < 8) {
        val b = java.lang.Integer.parseInt(hex.substring(off + 2 * i, off + 2 * i + 2), 16)
        w |= (b.toLong & 0xff) << (8 * i)
        i += 1
      }
      w
    }
    (word(0), word(16))
  }
}
