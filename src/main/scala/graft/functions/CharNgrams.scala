package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(t, n)` — a native Catalyst GENERATOR (the UDTF
  * extension surface): emits one `(pos, gram)` row per overlapping
  * character n-gram of `t`, straight from the Generate operator —
  * no intermediate array column in the user-visible plan and full
  * participation in GenerateExec's whole-stage codegen (the
  * collection builds through [[CharNgrams.grams]] inside the
  * generated code; position/iteration come from GenerateExec, same
  * as `posexplode`).
  *
  * This is the third extension tier the engine exercises: scalar
  * expressions (UuidStr, RollingHash, …), aggregates
  * (TypedImperativeAggregate sketches), and now a table function —
  * the row-generating shape `posexplode(transform(sequence(...)))`
  * composes out of builtins, packaged as ONE operator with the
  * n-gram slicing in a tight loop (each gram is a character-range
  * slice of the single input buffer; no lambda frames, no
  * per-element sequence materialization).
  *
  * Fewer than n characters → no rows (same row set as a
  * `length(t) >= n` guard on the HOF form).
  */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with CollectionGenerator {

  require(n >= 1, s"char_ngrams: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires STRING input, got ${other.simpleString}")
  }

  override val inline: Boolean = false
  override val position: Boolean = true
  override def collectionType: DataType = ArrayType(StringType, containsNull = false)

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("gram", StringType, nullable = false)

  override def prettyName: String = "char_ngrams"

  /** Interpreted path: rows carry (pos, gram), mirroring what
    * GenerateExec's codegen derives from the collection + index. */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = CharNgrams.grams(child.eval(input).asInstanceOf[UTF8String], n)
    val m = arr.numElements()
    val rows = new Array[InternalRow](m)
    var i = 0
    while (i < m) {
      rows(i) = InternalRow(i, arr.getUTF8String(i))
      i += 1
    }
    rows
  }

  /** Codegen path: produce the gram collection; GenerateExec iterates
    * it and synthesizes the position column (the Explode contract). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  private val empty = new GenericArrayData(Array.empty[Any])

  /** All overlapping character n-grams of `t`, in order. Character
    * (codepoint) indexed, so multi-byte text slices correctly; the
    * normalized `[a-z0-9 ]` corpus path is pure ASCII anyway.
    * NULL-SAFE by contract: Generator.nullable is false, so codegen
    * emits no null guard around this call — a null input means "no
    * rows", exactly explode(NULL)'s behavior. */
  def grams(t: UTF8String, n: Int): ArrayData = {
    if (t == null) return empty
    val len = t.numChars()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = t.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
