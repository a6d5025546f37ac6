package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `qsample_agg(h, tie, v, k)` — the mergeable QUANTILE sketch that
  * completes the sketch family (HLL cardinality, KMV resemblance, CMS
  * frequency, Misra-Gries heavy hitters, fixed-width histogram): a
  * deterministic bottom-k-by-hash row sample carrying a value column,
  * evaluated as the sample's order statistics.
  *
  * The k rows with the smallest (h, tie) key keep their `v`; `eval`
  * returns those values ASCENDING, so quantile p of the group is
  * `element_at(sample, 1 + floor(p * (size - 1)))` — the lower order
  * statistic, computable identically in any SQL engine (the DuckDB
  * oracle spells it with two row_number windows). With h drawn from
  * the engine's shared md5-prefix domain the sample is a uniform
  * random subset fixed by the DATA, not the partitioning: selection
  * by (h, tie) with a row-unique tie column (doc_id/event_id) is a
  * total order, so the result is partition- and merge-order-invariant
  * even under 60-bit hash collisions — bit-reproducible across
  * engines, which a classic KLL/t-digest (compaction-order-dependent)
  * can never be. Sample-quantile error is the standard
  * O(sqrt(p(1-p)/k)) binomial band.
  *
  * State is a bounded sorted set (≤ k (h, tie, v) triples, 24·k
  * bytes), merged by union-and-trim — associative, commutative,
  * map-side combinable: per group only k rows ever cross the wire
  * regardless of corpus size. At 100 TB a per-language length/quality
  * distribution is one partial-agg'd groupBy, never a sort or a
  * corpus-sized window.
  *
  * Reference scope note: the reference (kafka-firehose-nozzle) has no
  * aggregation surface beyond counters (SURVEY §2.2); this belongs to
  * the training-data-pipeline extension.
  */
case class QsampleAgg(
    h: Expression,
    tie: Expression,
    v: Expression,
    k: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]] {

  require(k > 0, s"qsample_agg requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(h, tie, v)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "qsample_agg requires BIGINT (h, tie, v) inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "qsample_agg"

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](QsampleAgg.Cmp)

  private def add(buf: java.util.TreeSet[Array[Long]], row: Array[Long]): Unit = {
    buf.add(row)
    if (buf.size() > k) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[Array[Long]],
      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val hv = h.eval(input)
    val tv = tie.eval(input)
    val vv = v.eval(input)
    if (hv != null && tv != null && vv != null)
      add(buf, Array(hv.asInstanceOf[Long], tv.asInstanceOf[Long],
        vv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]],
      other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  /** Sampled values ASCENDING BY VALUE (fewer than k if the group is
    * small — the sample is then the whole group and the "estimate"
    * is exact). */
  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val vals = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next()(2); i += 1 }
    java.util.Arrays.sort(vals)
    val out = new Array[Any](vals.length)
    i = 0
    while (i < vals.length) { out(i) = vals(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      bb.putLong(r(0)); bb.putLong(r(1)); bb.putLong(r(2))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Array[Long]](QsampleAgg.Cmp)
    var i = 0
    while (i < n) { s.add(Array(bb.getLong, bb.getLong, bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QsampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QsampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QsampleAgg =
    copy(h = newChildren(0), tie = newChildren(1), v = newChildren(2))
}

object QsampleAgg {
  /** Lexicographic on the (h, tie) key; v rides along. (h, tie) is
    * unique by the caller's contract (tie = a row id), so v never
    * participates in ordering and exact-duplicate dedup cannot occur.
    * A named Serializable object: the expression (and thus its
    * comparator) ships inside the task closure. */
  private object Cmp extends Comparator[Array[Long]] with Serializable {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    }
  }
}
