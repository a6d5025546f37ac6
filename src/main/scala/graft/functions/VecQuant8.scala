package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_quant8(emb)` — symmetric int8 quantization of an embedding:
  * each component maps to `floor(x * 127 / maxabs)` clamped to
  * [-127, 127], where `maxabs` is the vector's max |component| (the
  * per-vector scale); an all-zero vector quantizes to all zeros. The
  * clamp matters: double-rounding in `(x·127)/maxabs` can land a hair
  * past ±127 for the max-magnitude component, which floor alone would
  * take to -128.
  *
  * The storage/ANN-compression step of an embedding pipeline: 4×
  * smaller vectors whose integer dot products approximate cosine
  * ranking. `floor` (not round-half-up) keeps the mapping exactly
  * reproducible across engines — no half-way rounding surface — and
  * every output is an integer, so the oracle hash-matches.
  *
  * NULL semantics: NULL array → NULL; a NULL element poisons the
  * vector to NULL (matching the HOF chain it replaces).
  */
case class VecQuant8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_quant8 requires ARRAY<FLOAT|DOUBLE> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_quant8"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VecQuant8.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.functions.VecQuant8.compute($c, $isFloat);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VecQuant8 =
    copy(child = newChild)
}

object VecQuant8 {
  def compute(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val xs = new Array[Double](n)
    var maxabs = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      xs(i) = x
      val ax = math.abs(x)
      if (ax > maxabs) maxabs = ax
      i += 1
    }
    val out = new Array[Long](n)
    if (maxabs > 0.0d) {
      i = 0
      while (i < n) {
        // clamp: double-rounding in (x*127)/maxabs can land a hair
        // past ±127 for the max-magnitude component (two rounding
        // errors exceed the ULP at 127), which floor would take to
        // -128 — outside the documented int8 range
        val q = math.floor(xs(i) * 127.0d / maxabs).toLong
        out(i) = math.max(-127L, math.min(127L, q))
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
