package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `md5prefix60(bytes)` — the engine's portable 60-bit hash computed
  * DIRECTLY from the MD5 digest: the unsigned big-endian value of the
  * first 8 digest bytes, shifted right 4 — bit-identical to the
  * expression every query spells as
  * `cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)`
  * (15 lowercase hex chars = the digest's first 60 bits), but without
  * materializing the 32-char hex string, the 15-char substring, or
  * running the base-16 → base-10 string conversion per row. The
  * [[graft.plans.Md5PrefixFold]] optimizer rule rewrites the spelled
  * form to this expression, so every hash-heavy query in the suite
  * (LSH, MinHash planes, shuffles, sampling gates, sketches) gets the
  * fused kernel for free while oracles keep hash-matching — the
  * spelled form REMAINS the cross-engine spec; this is only the
  * execution of it. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5prefix60 requires BINARY input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5prefix60"

  override protected def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.Md5Prefix60.hash($b)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — equal to
    * parsing the first 15 lowercase-hex chars of the digest. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
