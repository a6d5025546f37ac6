package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A compiled Aho-Corasick automaton: one pass over the text counts
  * occurrences of EVERY dictionary pattern at every start position
  * (overlaps included) — O(|text| + matches) regardless of dictionary
  * size. This is the graduation path the IN-set probes (q57 word-set
  * scrub, q89 boilerplate span scrub) document for dictionaries too
  * large to ride the plan as literals: the automaton is built once
  * per executor from the broadcast pattern list and the scan cost
  * stops depending on |dictionary|.
  *
  * Built as dense-int tables (flattened goto map, fail links,
  * per-node terminal counts aggregated through the fail chain at
  * build time), so matching is branch-light array walking.
  */
final class AcAutomaton(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "ac automaton needs non-empty patterns")

  // trie build: node -> (char -> node), terminal pattern count per node
  private val (gotoMaps, outCounts, failLinks): (
      Array[mutable.LongMap[Int]], Array[Long], Array[Int]) = {
    val maps = mutable.ArrayBuffer(mutable.LongMap[Int]())
    val term = mutable.ArrayBuffer(0L)
    patterns.foreach { p =>
      var v = 0
      p.foreach { ch =>
        v = maps(v).getOrElseUpdate(ch.toLong, {
          maps += mutable.LongMap[Int]()
          term += 0L
          maps.size - 1
        })
      }
      term(v) += 1L
    }
    // BFS fail links; fold terminal counts through the fail chain so
    // out(v) = patterns ending at ANY suffix of v's path — matching
    // then never walks fail chains per position
    val fail = Array.fill(maps.size)(0)
    val queue = mutable.Queue[Int]()
    maps(0).foreach { case (_, child) => queue += child }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      term(v) += term(fail(v))
      maps(v).foreach { case (ch, child) =>
        var f = fail(v)
        while (f != 0 && !maps(f).contains(ch)) f = fail(f)
        fail(child) = if (maps(f).contains(ch) && maps(f)(ch) != child)
          maps(f)(ch) else 0
        queue += child
      }
    }
    (maps.toArray, term.toArray, fail)
  }

  /** Total pattern occurrences in `s` (every start position, overlaps
    * counted — the same contract as a per-pattern positional scan). */
  def countMatches(s: UTF8String): Long = {
    val t = s.toString
    var state = 0
    var hits = 0L
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i).toLong
      while (state != 0 && !gotoMaps(state).contains(ch)) state = failLinks(state)
      state = gotoMaps(state).getOrElse(ch, 0)
      hits += outCounts(state)
      i += 1
    }
    hits
  }

  def size: Int = gotoMaps.length
}

/** `ac_count(text)` — total occurrences of the automaton's dictionary
  * patterns in the text, one pass, codegen'd via a reference object
  * (the automaton ships with the serialized expression and matching
  * stays inside WholeStageCodegen). */
case class AcCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ac_count requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_count"

  override protected def nullSafeEval(input: Any): Any =
    automaton.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcCount =
    copy(child = newChild)
}
