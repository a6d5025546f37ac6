package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.EnvelopeSchema

/** `envelope_decode(json)` — the decode side of the canonical JSON
  * contract as a native expression (O2, the reference's deserialize
  * step; async.go:274-280).
  *
  * One Jackson tree pass per row, schema-driven against
  * [[EnvelopeSchema.schema]]:
  *  - proto uint64 fields arrive as unsigned decimals that can exceed
  *    Long.MaxValue; `BigInteger.longValue()` keeps the low 64 bits —
  *    exactly the two's-complement representation the model stores
  *    (and [[EnvelopeJsonWriter]] re-prints unsigned);
  *  - `logMessage.message` is the wire's base64 string → bytes;
  *  - any structural violation (non-JSON, wrong node type, bad
  *    base64) → NULL — the reference's silently-skip-malformed policy
  *    (DROPMALFORMED is a `filter(isNotNull)` downstream);
  *  - absent and explicit-null fields are NULL, matching the
  *    encoder's omit-if-absent contract.
  *
  * A native expression (not a `from_json` + struct-rebuild
  * composition) so the one implementation serves the Column API and
  * the SQL registry alike — a Column-DSL tree cannot be registered as
  * a SQL function, and the composition paid two passes per row.
  *
  * Round-trip law (tested): `decode(envelope_json(e)) == e` for every
  * envelope whose maps/arrays are in canonical order.
  */
case class EnvelopeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"envelope_decode requires STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = EnvelopeSchema.schema
  override def nullable: Boolean = true
  override def prettyName: String = "envelope_decode"

  override protected def nullSafeEval(input: Any): Any =
    EnvelopeDecoder.parseOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.EnvelopeDecoder.parseOrNull(${c.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): EnvelopeDecode =
    copy(child = newChild)
}

object EnvelopeDecoder {

  private val mapper = new ObjectMapper

  /** Fast-fail marker for structural violations: no stack trace, one
    * shared instance — malformed input is a data condition, not an
    * error path worth allocating on. */
  private object Malformed
      extends RuntimeException("malformed envelope", null, false, false)
  private def fail(): Nothing = throw Malformed

  /** Parse canonical Envelope JSON; any malformed input → null. */
  def parseOrNull(s: UTF8String): InternalRow =
    try {
      val root = mapper.readTree(s.getBytes)
      if (root == null || !root.isObject) null
      else convertStruct(root, EnvelopeSchema.schema)
    } catch { case scala.util.control.NonFatal(_) => null }

  private def convertStruct(node: JsonNode, schema: StructType): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      val v = node.get(f.name)
      if (v != null && !v.isNull) row.update(i, convert(v, f.dataType))
      i += 1
    }
    row
  }

  private def convert(n: JsonNode, dt: DataType): Any = dt match {
    case StringType =>
      if (n.isTextual) UTF8String.fromString(n.textValue()) else fail()
    case IntegerType =>
      if (n.isIntegralNumber && n.canConvertToInt) n.intValue() else fail()
    case LongType =>
      // u64 two's-complement: BigInteger keeps values above Long.Max
      if (n.isIntegralNumber) n.bigIntegerValue().longValue() else fail()
    case DoubleType =>
      if (n.isNumber) n.doubleValue() else fail()
    case BinaryType =>
      if (n.isTextual) n.binaryValue() else fail() // throws on bad base64
    case s: StructType =>
      if (n.isObject) convertStruct(n, s) else fail()
    case ArrayType(StringType, _) =>
      if (!n.isArray) fail()
      else {
        val out = new Array[Any](n.size())
        var i = 0
        while (i < n.size()) {
          val e = n.get(i)
          out(i) = if (e.isTextual) UTF8String.fromString(e.textValue()) else fail()
          i += 1
        }
        new GenericArrayData(out)
      }
    case MapType(StringType, StringType, _) =>
      if (!n.isObject) fail()
      else {
        val ks = Array.newBuilder[Any]
        val vs = Array.newBuilder[Any]
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          if (!e.getValue.isTextual) fail()
          ks += UTF8String.fromString(e.getKey)
          vs += UTF8String.fromString(e.getValue.textValue())
        }
        ArrayBasedMapData(ks.result(), vs.result())
      }
    case _ => fail() // no other types appear in the envelope schema
  }
}
