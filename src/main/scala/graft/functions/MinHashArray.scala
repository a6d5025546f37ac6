package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `minhash_array(shingles)` — the 12-long MinHash signature of a
  * per-document shingle array, as a SCALAR expression: one md5 + 12
  * mixes per element, mins tracked in registers, no explode / shuffle
  * / group-by / join-back.
  *
  * Same hash family as [[MinHashAgg]] and the DuckDB oracle:
  * h = first 60 bits of md5(shingle) mod P, signature k =
  * min over shingles of ((1103515245·(k+1)+12345) mod P · h
  * + 977·(k+1)) mod P, P = 2^31−1 — cross-validated against the
  * aggregate in MinHashAggSpec.
  *
  * Division of labor: the near-dup join (q18) already materializes
  * the per-doc shingle arrays for exact Jaccard scoring, so deriving
  * signatures scalar-wise from that array is free of any extra plan
  * structure. [[MinHashAgg]] remains the streaming/100 TB shape for
  * pipelines that must NOT materialize per-doc arrays (signatures
  * from exploded shingles with fixed-size aggregation state).
  */
case class MinHashArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_array requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_array"

  override protected def nullSafeEval(input: Any): Any =
    MinHashArray.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MinHashArray.sig(${c.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashArray =
    copy(child = newChild)
}

object MinHashArray {
  private val K = 12
  private val P = 2147483647L // 2^31 - 1

  private val muls = Array.tabulate(K)(k => (1103515245L * (k + 1) + 12345L) % P)
  private val adds = Array.tabulate(K)(k => 977L * (k + 1))

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Empty array → null (no shingles ⇒ no signature, matching the
    * aggregate's empty-group NULL). */
  def sig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex chars of md5 == first 60 bits of the digest
      val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
      val hm = h60 % P
      var k = 0
      while (k < K) {
        val v = (muls(k) * hm + adds(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
