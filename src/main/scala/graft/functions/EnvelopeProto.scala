package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.EnvelopeSchema

/** The dropsonde protobuf WIRE codec — the reference's true O2 input
  * format (`proto.Unmarshal`, noaa async.go:274-280), implemented
  * directly against the public protobuf wire spec (varint / fixed64 /
  * length-delimited) since no protobuf runtime ships with the Spark
  * distribution.
  *
  * Field numbers and types follow the sonde-go generated structs:
  *  - Envelope: origin=1 eventType=2 timestamp=6 httpStartStop=7
  *    logMessage=8 valueMetric=9 counterEvent=10 error=11
  *    containerMetric=12 deployment=13 job=14 index=15 ip=16 tags=17
  *    (envelope.pb.go:98-117);
  *  - LogMessage 1..6 (log.pb.go:56-64), ValueMetric 1..3 /
  *    CounterEvent 1..3 / ContainerMetric 1..7 (metric.pb.go),
  *    HttpStartStop 1..15 (http.pb.go:217-233), Error 1..3
  *    (error.pb.go), UUID low=1 high=2 (uuid.pb.go:23-27);
  *  - proto map<string,string> = repeated {key=1, value=2} messages.
  *
  * Decode skips unknown fields by wire type (forward compatible) and
  * returns NULL on any malformed frame — the reference's
  * silently-skip policy. uint64 fields ride Scala Long two's
  * complement, same convention as the JSON codec.
  *
  * Round-trip law (tested): `proto_decode(envelope_proto(e)) == e`.
  */
case class EnvelopeProtoEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if EnvelopeSchema.compatible(s, EnvelopeSchema.schema) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"envelope_proto requires the canonical Envelope struct, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "envelope_proto"

  override protected def nullSafeEval(input: Any): Any =
    EnvelopeProto.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EnvelopeProto.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): EnvelopeProtoEncode =
    copy(child = newChild)
}

case class EnvelopeProtoDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"envelope_proto_decode requires BINARY input, got ${other.simpleString}")
  }

  override def dataType: DataType = EnvelopeSchema.schema
  override def nullable: Boolean = true
  override def prettyName: String = "envelope_proto_decode"

  override protected def nullSafeEval(input: Any): Any =
    EnvelopeProto.decodeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.EnvelopeProto.decodeOrNull(${c.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): EnvelopeProtoDecode =
    copy(child = newChild)
}

object EnvelopeProto {

  // ---------------------------------------------------------------- encode

  def encode(env: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    if (!env.isNullAt(0)) writeStr(out, 1, env.getUTF8String(0))
    if (!env.isNullAt(1)) writeVarintField(out, 2, env.getInt(1).toLong)
    if (!env.isNullAt(2)) writeVarintField(out, 6, env.getLong(2))
    if (!env.isNullAt(8)) writeMsg(out, 7, encodeHttpStartStop(env.getStruct(8, 14)))
    if (!env.isNullAt(9)) writeMsg(out, 8, encodeLogMessage(env.getStruct(9, 6)))
    if (!env.isNullAt(10)) writeMsg(out, 9, encodeValueMetric(env.getStruct(10, 3)))
    if (!env.isNullAt(11)) writeMsg(out, 10, encodeCounterEvent(env.getStruct(11, 3)))
    if (!env.isNullAt(12)) writeMsg(out, 11, encodeError(env.getStruct(12, 3)))
    if (!env.isNullAt(13)) writeMsg(out, 12, encodeContainerMetric(env.getStruct(13, 7)))
    if (!env.isNullAt(3)) writeStr(out, 13, env.getUTF8String(3))
    if (!env.isNullAt(4)) writeStr(out, 14, env.getUTF8String(4))
    if (!env.isNullAt(5)) writeStr(out, 15, env.getUTF8String(5))
    if (!env.isNullAt(6)) writeStr(out, 16, env.getUTF8String(6))
    if (!env.isNullAt(7)) writeTags(out, 17, env.getMap(7))
    out.toByteArray
  }

  private def encodeLogMessage(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    if (!r.isNullAt(0)) writeBytes(out, 1, r.getBinary(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getInt(1).toLong)
    if (!r.isNullAt(2)) writeVarintField(out, 3, r.getLong(2))
    if (!r.isNullAt(3)) writeStr(out, 4, r.getUTF8String(3))
    if (!r.isNullAt(4)) writeStr(out, 5, r.getUTF8String(4))
    if (!r.isNullAt(5)) writeStr(out, 6, r.getUTF8String(5))
    out.toByteArray
  }

  private def encodeValueMetric(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    if (!r.isNullAt(0)) writeStr(out, 1, r.getUTF8String(0))
    if (!r.isNullAt(1)) writeFixed64(out, 2, java.lang.Double.doubleToLongBits(r.getDouble(1)))
    if (!r.isNullAt(2)) writeStr(out, 3, r.getUTF8String(2))
    out.toByteArray
  }

  private def encodeCounterEvent(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    if (!r.isNullAt(0)) writeStr(out, 1, r.getUTF8String(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getLong(1))
    if (!r.isNullAt(2)) writeVarintField(out, 3, r.getLong(2))
    out.toByteArray
  }

  private def encodeContainerMetric(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(48)
    if (!r.isNullAt(0)) writeStr(out, 1, r.getUTF8String(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getInt(1).toLong)
    if (!r.isNullAt(2)) writeFixed64(out, 3, java.lang.Double.doubleToLongBits(r.getDouble(2)))
    if (!r.isNullAt(3)) writeVarintField(out, 4, r.getLong(3))
    if (!r.isNullAt(4)) writeVarintField(out, 5, r.getLong(4))
    if (!r.isNullAt(5)) writeVarintField(out, 6, r.getLong(5))
    if (!r.isNullAt(6)) writeVarintField(out, 7, r.getLong(6))
    out.toByteArray
  }

  private def encodeError(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    if (!r.isNullAt(0)) writeStr(out, 1, r.getUTF8String(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getInt(1).toLong)
    if (!r.isNullAt(2)) writeStr(out, 3, r.getUTF8String(2))
    out.toByteArray
  }

  private def encodeUuid(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(24)
    if (!r.isNullAt(0)) writeVarintField(out, 1, r.getLong(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getLong(1))
    out.toByteArray
  }

  private def encodeHttpStartStop(r: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(96)
    if (!r.isNullAt(0)) writeVarintField(out, 1, r.getLong(0))
    if (!r.isNullAt(1)) writeVarintField(out, 2, r.getLong(1))
    if (!r.isNullAt(2)) writeMsg(out, 3, encodeUuid(r.getStruct(2, 2)))
    if (!r.isNullAt(3)) writeVarintField(out, 4, r.getInt(3).toLong)
    if (!r.isNullAt(4)) writeVarintField(out, 5, r.getInt(4).toLong)
    if (!r.isNullAt(5)) writeStr(out, 6, r.getUTF8String(5))
    if (!r.isNullAt(6)) writeStr(out, 7, r.getUTF8String(6))
    if (!r.isNullAt(7)) writeStr(out, 8, r.getUTF8String(7))
    if (!r.isNullAt(8)) writeVarintField(out, 9, r.getInt(8).toLong)
    if (!r.isNullAt(9)) writeVarintField(out, 10, r.getLong(9))
    if (!r.isNullAt(10)) writeMsg(out, 12, encodeUuid(r.getStruct(10, 2)))
    if (!r.isNullAt(11)) writeVarintField(out, 13, r.getInt(11).toLong)
    if (!r.isNullAt(12)) writeStr(out, 14, r.getUTF8String(12))
    if (!r.isNullAt(13)) {
      val a = r.getArray(13)
      var i = 0
      while (i < a.numElements()) {
        writeStr(out, 15, a.getUTF8String(i))
        i += 1
      }
    }
    out.toByteArray
  }

  private def writeTags(out: ByteArrayOutputStream, field: Int, m: MapData): Unit = {
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val entry = new ByteArrayOutputStream(32)
      writeStr(entry, 1, ks.getUTF8String(i))
      writeStr(entry, 2, vs.getUTF8String(i))
      writeMsg(out, field, entry.toByteArray)
      i += 1
    }
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, ((field << 3) | wireType).toLong)

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeTag(out, field, 0); writeVarint(out, v)
  }

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeFixed64(out: ByteArrayOutputStream, field: Int, bits: Long): Unit = {
    writeTag(out, field, 1)
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeStr(out: ByteArrayOutputStream, field: Int, s: UTF8String): Unit =
    writeBytes(out, field, s.getBytes)

  private def writeBytes(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** A nested message is just its encoded bytes, length-delimited. */
  private def writeMsg(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit =
    writeBytes(out, field, b)

  // ---------------------------------------------------------------- decode

  private object Malformed
      extends RuntimeException("malformed proto frame", null, false, false)
  private def fail(): Nothing = throw Malformed

  /** Streaming cursor over one frame; all reads bounds-checked. */
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        if (pos >= end) fail()
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      fail()
    }
    def fixed64(): Long = {
      if (pos + 8 > end) fail()
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    // `end - pos` is a small non-negative Int, so the comparison cannot
    // wrap even when the length varint is near 2^63 (a crafted frame with
    // `pos + n` would overflow negative and pass, looping the decoder).
    def bytes(): Array[Byte] = {
      val n = varint()
      if (n < 0 || n > (end - pos).toLong) fail()
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt)
      pos += n.toInt
      out
    }
    def sub(): Reader = {
      val n = varint()
      if (n < 0 || n > (end - pos).toLong) fail()
      val r = new Reader(buf, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => fixed64(); ()
      case 2 => bytes(); ()
      case 5 => if (pos + 4 > end) fail() else pos += 4
      case _ => fail()
    }
  }

  def decodeOrNull(frame: Array[Byte]): InternalRow =
    try decodeEnvelope(new Reader(frame, 0, frame.length))
    catch { case scala.util.control.NonFatal(_) => null }

  // Known fields validate their declared wire type (2 = length-delimited,
  // 0 = varint, 1 = fixed64) so a field sent with the wrong encoding fails
  // the frame → NULL, matching proto.Unmarshal's rejection rather than
  // decoding garbage. Unknown fields still skip by wire type.
  private def vint(r: Reader, wt: Int): Long = { if (wt != 0) fail(); r.varint() }
  private def f64(r: Reader, wt: Int): Long = { if (wt != 1) fail(); r.fixed64() }
  private def bin(r: Reader, wt: Int): Array[Byte] = { if (wt != 2) fail(); r.bytes() }
  private def sub(r: Reader, wt: Int): Reader = { if (wt != 2) fail(); r.sub() }
  private def str(r: Reader, wt: Int): UTF8String =
    UTF8String.fromBytes(bin(r, wt))

  private def decodeEnvelope(r: Reader): InternalRow = {
    val row = new GenericInternalRow(14)
    var tagKeys: List[UTF8String] = Nil
    var tagVals: List[UTF8String] = Nil
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      field match {
        case 1 => row.update(0, str(r, wt))
        case 2 => row.update(1, vint(r, wt).toInt)
        case 6 => row.update(2, vint(r, wt))
        case 7 => row.update(8, decodeHttpStartStop(sub(r, wt)))
        case 8 => row.update(9, decodeLogMessage(sub(r, wt)))
        case 9 => row.update(10, decodeValueMetric(sub(r, wt)))
        case 10 => row.update(11, decodeCounterEvent(sub(r, wt)))
        case 11 => row.update(12, decodeError(sub(r, wt)))
        case 12 => row.update(13, decodeContainerMetric(sub(r, wt)))
        case 13 => row.update(3, str(r, wt))
        case 14 => row.update(4, str(r, wt))
        case 15 => row.update(5, str(r, wt))
        case 16 => row.update(6, str(r, wt))
        case 17 =>
          val e = sub(r, wt)
          // Go proto yields the zero value "" for absent map-entry fields:
          // an entry missing key or value still materializes with "".
          var k: UTF8String = UTF8String.EMPTY_UTF8
          var v: UTF8String = UTF8String.EMPTY_UTF8
          while (e.hasMore) {
            val t = e.varint()
            val ewt = (t & 7).toInt
            (t >>> 3).toInt match {
              case 1 => k = str(e, ewt)
              case 2 => v = str(e, ewt)
              case _ => e.skip(ewt)
            }
          }
          tagKeys = k :: tagKeys; tagVals = v :: tagVals
        case _ => r.skip(wt)
      }
    }
    if (tagKeys.nonEmpty)
      row.update(7, ArrayBasedMapData(
        tagKeys.reverse.toArray[Any], tagVals.reverse.toArray[Any]))
    row
  }

  private def decodeLogMessage(r: Reader): InternalRow = {
    val row = new GenericInternalRow(6)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, bin(r, wt))
        case 2 => row.update(1, vint(r, wt).toInt)
        case 3 => row.update(2, vint(r, wt))
        case 4 => row.update(3, str(r, wt))
        case 5 => row.update(4, str(r, wt))
        case 6 => row.update(5, str(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeValueMetric(r: Reader): InternalRow = {
    val row = new GenericInternalRow(3)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, str(r, wt))
        case 2 => row.update(1, java.lang.Double.longBitsToDouble(f64(r, wt)))
        case 3 => row.update(2, str(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeCounterEvent(r: Reader): InternalRow = {
    val row = new GenericInternalRow(3)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, str(r, wt))
        case 2 => row.update(1, vint(r, wt))
        case 3 => row.update(2, vint(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeContainerMetric(r: Reader): InternalRow = {
    val row = new GenericInternalRow(7)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, str(r, wt))
        case 2 => row.update(1, vint(r, wt).toInt)
        case 3 => row.update(2, java.lang.Double.longBitsToDouble(f64(r, wt)))
        case 4 => row.update(3, vint(r, wt))
        case 5 => row.update(4, vint(r, wt))
        case 6 => row.update(5, vint(r, wt))
        case 7 => row.update(6, vint(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeError(r: Reader): InternalRow = {
    val row = new GenericInternalRow(3)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, str(r, wt))
        case 2 => row.update(1, vint(r, wt).toInt)
        case 3 => row.update(2, str(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeUuid(r: Reader): InternalRow = {
    val row = new GenericInternalRow(2)
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, vint(r, wt))
        case 2 => row.update(1, vint(r, wt))
        case _ => r.skip(wt)
      }
    }
    row
  }

  private def decodeHttpStartStop(r: Reader): InternalRow = {
    val row = new GenericInternalRow(14)
    var fwd: List[UTF8String] = Nil
    while (r.hasMore) {
      val tag = r.varint()
      val wt = (tag & 7).toInt
      (tag >>> 3).toInt match {
        case 1 => row.update(0, vint(r, wt))
        case 2 => row.update(1, vint(r, wt))
        case 3 => row.update(2, decodeUuid(sub(r, wt)))
        case 4 => row.update(3, vint(r, wt).toInt)
        case 5 => row.update(4, vint(r, wt).toInt)
        case 6 => row.update(5, str(r, wt))
        case 7 => row.update(6, str(r, wt))
        case 8 => row.update(7, str(r, wt))
        case 9 => row.update(8, vint(r, wt).toInt)
        case 10 => row.update(9, vint(r, wt))
        case 12 => row.update(10, decodeUuid(sub(r, wt)))
        case 13 => row.update(11, vint(r, wt).toInt)
        case 14 => row.update(12, str(r, wt))
        case 15 => fwd = str(r, wt) :: fwd
        case _ => r.skip(wt)
      }
    }
    if (fwd.nonEmpty)
      row.update(13, new GenericArrayData(fwd.reverse.toArray[Any]): ArrayData)
    row
  }
}
