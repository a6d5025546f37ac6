package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow(t, k, w)` — the winnowing fingerprint set of a string
  * (Schleimer/Wilkerson/Aiken, SIGMOD '03 — the MOSS algorithm): slide
  * a window of `w` consecutive k-gram hashes and keep each window's
  * minimum; the selected set is a position-robust ~2/(w+1)-density
  * sample of the document's k-grams with a guarantee the ad-hoc
  * `hash % p == 0` sampler lacks (every shared substring of length
  * ≥ k + w − 1 shares at least one selected fingerprint).
  *
  * Determinism across engines without argmin tie rules: each position's
  * hash is packed as `h·2^21 + (2^20 − p)` — distinct per position, so
  * the window minimum is unique and a plain `min()` window aggregate
  * reproduces the selection in ANSI SQL (rightmost-lowest-hash
  * tiebreak falls out of the packing). k-gram hashes are the q26
  * 31-polynomial mod 2^31−1 over bytes, computed ROLLING (one multiply
  * + one subtract per step, O(n) total vs O(n·k) recompute — the
  * modular top-term subtraction uses the precomputed 31^(k−1) mod P).
  *
  * Output: sorted distinct packed fingerprints. Decode with
  * `fp div 2^21` (hash) and `2^20 − fp % 2^21` (k-gram position).
  * Shorter-than-one-window documents (k ≤ len < k+w−1) yield their
  * single truncated-window minimum; len < k yields empty.
  *
  * Positions must fit the 2^20 packing field: documents longer than
  * ~1M chars fail LOUDLY — at 100 TB chunk first (q50's operator) and
  * winnow chunks; selection is map-only either way (no explode, no
  * per-position shuffle — the fingerprint set rides the document row).
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2 || k > 64) TypeCheckResult.TypeCheckFailure(
      s"winnow k must be in [2, 64], got $k")
    else if (w < 1 || w > 256) TypeCheckResult.TypeCheckFailure(
      s"winnow w must be in [1, 256], got $w")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow requires STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  private val P = 2147483647L          // 2^31 − 1, the q26 hash modulus
  private val POS = 1 << 20            // position packing field
  private val empty = new GenericArrayData(Array.empty[Any])

  def select(t: UTF8String, k: Int, w: Int): ArrayData = {
    val b = t.getBytes
    val n = b.length
    val m = n - k + 1                  // k-gram count
    if (m <= 0) return empty
    require(n < POS,
      s"winnow: document length $n exceeds the 2^20 position packing " +
        "bound — chunk documents (q50) before winnowing")
    // 31^(k-1) mod P for the rolling top-term removal
    var topPow = 1L
    var i = 1
    while (i < k) { topPow = (topPow * 31L) % P; i += 1 }
    // packed[p] = h_p·2^21 + (2^20 − p), h_p = hash(bytes p..p+k-1)
    val packed = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31L + (b(i) & 0xff)) % P; i += 1 }
    packed(0) = (h << 21) + (POS - 1)
    var p = 1
    while (p < m) {
      // drop byte p-1's top term, shift, add byte p+k-1 (mod-safe: the
      // subtraction is made non-negative before the multiply)
      h = (h - (((b(p - 1) & 0xff) * topPow) % P) + P) % P
      h = (h * 31L + (b(p + k - 1) & 0xff)) % P
      packed(p) = (h << 21) + (POS - 1 - p)
      p += 1
    }
    // window minima: one deque-free O(m·w) pass is fine for w ≤ 256;
    // windows start at j ∈ [0, max(m−w, 0)]
    val jMax = math.max(m - w, 0)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= jMax) {
      var mn = packed(j)
      var q = j + 1
      val end = math.min(j + w, m)
      while (q < end) { if (packed(q) < mn) mn = packed(q); q += 1 }
      sel.add(mn)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}
