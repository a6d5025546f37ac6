package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The SKETCH-ALGEBRA half of [[HllAgg]]: `hll_regs` keeps the 2^b
  * register array itself as the aggregate value, and `hll_union` folds
  * register arrays back into the exact-integer S (same S as running
  * `hll_agg` over the union of the inputs — register max is
  * associative/commutative/idempotent, so union-of-sketches ≡
  * sketch-of-union, bit for bit).
  *
  * This is what makes HLL a DATA ENGINEERING primitive rather than a
  * query function: land per-partition sketches once (per source, per
  * day, per shard), then answer ANY rollup — totals, source groups,
  * trailing windows — by merging 2^b-byte rows, never rescanning the
  * corpus. At 100 TB the difference is a 64-byte-per-group frame vs a
  * full second pass.
  */
case class HllRegs(
    child: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << b
  private val maxRho = 60 - b + 1

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (b < 4 || b > 12) TypeCheckResult.TypeCheckFailure(
      s"hll_regs b must be in [4, 12], got $b")
    else if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_regs requires BIGINT input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0 && h < (1L << 60),
        s"hll_regs expects hashes in [0, 2^60), got $h — feed the engine's " +
          "60-bit md5-prefix hashes")
      val j = (h & (m - 1)).toInt
      val w = h >>> b
      val rho = if (w == 0) maxRho else 60 - b - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegs =
    copy(child = newChildren.head)
}

/** `hll_union(regs, b)` — fold [[HllRegs]] register arrays by
  * element-wise max and evaluate the exact-integer S (the [[HllAgg]]
  * output contract: S = Σ_j 2^(maxrho − r_j), a sum of powers of two
  * ≤ 2^61 — exact in a BIGINT, so merged rollups sit under the same
  * hash-match gate as direct sketches). */
case class HllUnion(
    child: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << b
  private val maxRho = 60 - b + 1

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (b < 4 || b > 12) TypeCheckResult.TypeCheckFailure(
      s"hll_union b must be in [4, 12], got $b")
    else if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_union requires BINARY register input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_union"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == m,
        s"hll_union expects 2^$b registers, got ${regs.length} — the b " +
          "argument must match the hll_regs that built the sketch")
      var j = 0
      while (j < m) { if (regs(j) > buf(j)) buf(j) = regs(j); j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var j = 0
    while (j < m) { s += 1L << (maxRho - buf(j)); j += 1 }
    s
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllUnion =
    copy(child = newChildren.head)
}
