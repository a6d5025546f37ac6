package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(word, capacity)` — a Misra-Gries frequent-items
  * summary over a string stream: at most `capacity` counters per
  * aggregation buffer, map-side combinable with the mergeable-
  * summaries merge (sum counters, then subtract the (capacity+1)-th
  * largest and drop non-positives — Agarwal et al., PODS'12).
  *
  * Guarantee (survives any merge tree): every item with true
  * frequency > N/(capacity+1) keeps a positive counter, so the
  * output is a SUPERSET of the heavy hitters at any threshold above
  * that. The scale pattern is sketch → candidates → exact confirm
  * (q54): the corpus-wide (word, count) shuffle that a naive
  * heavy-hitters query pays — one row per DISTINCT WORD — collapses
  * to a fixed `capacity`-bounded state per partition, and only the
  * ≤ capacity candidates are exactly re-counted. The candidate SET
  * may vary with merge order (sketch semantics); the exact confirm
  * makes the final query output deterministic regardless.
  *
  * Output: the surviving items, sorted, as ARRAY<STRING>.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires STRING input, got ${child.dataType.simpleString}")
    else if (capacity < 1 || capacity > 1000000)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries capacity must be in [1, 10^6], got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String]
      buf.get(w) match {
        case Some(c) => buf.update(w, c + 1L)
        case None if buf.size < capacity =>
          buf.update(w.clone(), 1L) // copy: input row buffers are reused
        case None =>
          // decrement-all MG step; total decrements per partition ≤ N
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter, drop non-positives
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(buf.size - capacity - 1)
      buf.mapValuesInPlace((_, c) => c - m)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var n = 4
    buf.foreach { case (k, _) => n += 4 + k.numBytes() + 8 }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val v = bb.getLong
      m.update(UTF8String.fromBytes(b), v)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
