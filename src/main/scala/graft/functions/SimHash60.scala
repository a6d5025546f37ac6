package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash60(shingles)` — the 60-bit SimHash of a per-document
  * shingle array as a SCALAR expression: per shingle one md5 (its
  * first 60 bits are the feature hash, the same
  * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)` domain the DuckDB
  * oracle uses), per bit a ±1 vote, bit j set iff the vote is
  * positive (2·ones > n).
  *
  * Replaces the explode + 60-conditional-sum aggregation shape: that
  * was the right call against the interpreted nested-HOF formulation
  * (50× slower), but it still shuffled one row per (doc, shingle)
  * and aggregated 61 columns; this computes the signature in
  * registers on the scan side, making SimHash map-only — no shuffle
  * at any scale.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = -1L;
        if (!${c.isNull}) {
          Long tmp = graft.functions.SimHash60.sig(${c.value});
          if (tmp != null) { ${ev.isNull} = false; ${ev.value} = tmp.longValue(); }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Empty array → null (no features ⇒ no signature). Boxed so
    * codegen can branch on null. */
  def sig(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val ones = new Array[Int](60)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
      var j = 0
      while (j < 60) {
        ones(j) += ((h60 >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2 * ones(j) > n) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
