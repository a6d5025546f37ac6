package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** `hll_agg(h, b)` — HyperLogLog distinct-count sketch (Flajolet et
  * al. 2007) over the engine's portable 60-bit md5-prefix hash domain,
  * with 2^b registers (b ∈ [4, 12]).
  *
  * Register update: bucket = h mod 2^b, w = h div 2^b (a 60−b bit
  * value), rho(w) = leading-zero count of w within its 60−b bit field
  * + 1 (w = 0 → 60−b+1); register j keeps max rho. State is 2^b BYTES
  * — constant, associative, commutative, map-side combinable: the
  * shuffle carries 2^b bytes per group at ANY cardinality (vs KMV's
  * k longs, vs exact distinct's one row per value). This is the
  * sketch for per-group distinct users/tokens at 100 TB; q38's KMV
  * stays the choice when the k-th-minimum itself must be exact.
  *
  * Determinism: the result is the INTEGER `S = Σ_j 2^(maxrho − r_j)`
  * (maxrho = 60 − b + 1; empty registers contribute 2^maxrho) — S is
  * a sum of 2^b powers of two ≤ 2^61, exact in a BIGINT and exactly
  * reproducible by the oracle's GROUP BY/max replay, putting the
  * sketch itself under the hash-match gate (like KMV, unlike a
  * float-summed HLL). The classic estimate is the pure function
  * `E = alpha_m · m² · 2^maxrho / S`, computed OUTSIDE the sketch by
  * one double division of exact integers (identical IEEE sequence in
  * both engines). The small-range linear-counting correction is
  * intentionally omitted: it needs ln(), whose cross-engine bit
  * equality is not guaranteed — callers below ~5/2·m distinct should
  * use exact counting anyway.
  */
case class HllAgg(
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
      s"hll_agg b must be in [4, 12], got $b")
    else if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_agg requires BIGINT input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0 && h < (1L << 60),
        s"hll_agg expects hashes in [0, 2^60), got $h — feed the engine's " +
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

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var j = 0
    while (j < m) { s += 1L << (maxRho - buf(j)); j += 1 }
    s
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}
