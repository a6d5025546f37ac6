package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bigram_scores(words, 'p1a,p1b;p2a,...')` — for each profile in
  * the `;`-separated spec, how many words start with one of the
  * profile's 2-char bigrams. The language-ID scoring kernel: ONE pass
  * over the word array updating all profile counters via a packed
  * 16-bit-code → profile-bitmask table, replacing one interpreted
  * `size(filter(transform(words, ...)))` HOF chain PER LANGUAGE.
  *
  * Words are from normalized `[a-z0-9 ]` text, so the first two
  * bytes ARE the first two characters; words shorter than 2 chars
  * match nothing (exactly `substring(w, 1, 2)`'s behavior against
  * 2-char markers). The spec must be a foldable literal; up to 32
  * profiles.
  */
case class BigramScores(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "bigram_scores profile spec must not be NULL")
        case spec =>
          val profiles = spec.toString.split(';')
          if (profiles.length > 32)
            TypeCheckResult.TypeCheckFailure("bigram_scores supports at most 32 profiles")
          else profiles.iterator.flatMap(_.split(',')).map(_.trim)
            .find(_.length != 2) match {
              case Some(m) => TypeCheckResult.TypeCheckFailure(
                s"bigram_scores marker '$m' must be exactly 2 chars")
              case None => TypeCheckResult.TypeCheckSuccess
            }
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bigram_scores requires (ARRAY<STRING>, foldable STRING), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_scores"

  @transient private lazy val nProfiles: Int =
    right.eval().toString.split(';').length

  /** code (two ASCII bytes packed) → bitmask of profiles containing
    * that bigram. 64K ints, built once per executor instance. */
  @transient private lazy val table: Array[Int] = {
    val t = new Array[Int](1 << 16)
    right.eval().toString.split(';').zipWithIndex.foreach { case (profile, idx) =>
      profile.split(',').foreach { marker =>
        val m = marker.trim
        require(m.length == 2, s"marker '$m' must be 2 chars")
        t(((m.charAt(0) & 0xff) << 8) | (m.charAt(1) & 0xff)) |= 1 << idx
      }
    }
    t
  }

  def score(words: ArrayData): ArrayData = {
    val counts = new Array[Long](nProfiles)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() >= 2) {
          var mask = table(((w.getByte(0) & 0xff) << 8) | (w.getByte(1) & 0xff))
          while (mask != 0) {
            counts(java.lang.Integer.numberOfTrailingZeros(mask)) += 1
            mask &= mask - 1
          }
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def nullSafeEval(w: Any, s: Any): Any =
    score(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramScores", this, classOf[BigramScores].getName)
    defineCodeGen(ctx, ev, (w, _) => s"$ref.score($w)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramScores =
    copy(left = newLeft, right = newRight)
}
