package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * tsquery FOLLOWED-BY with distance — `a <N> b` (reference:
 * src/common/backend/utils/adt/tsvector_op.cpp tsCheckTypePhrase;
 * `<->` is `<1>`): true iff the text contains terms at token positions
 * p_0 < p_1 < … with p_j − p_{j−1} = gap_j exactly.
 *
 * The adjacent case (all gaps 1) compiles to a substring probe in
 * [[graft.operators.FullText]]; this expression covers general gaps,
 * where substring containment can't express the position arithmetic.
 * The token scan runs in ONE compiled method per row (no interpreted
 * HOF lambdas, no explode/positions materialization), called directly
 * from generated code so whole-stage codegen stays intact.
 */
case class PhraseGapMatch(child: Expression, terms: Seq[String], gaps: Seq[Int],
    prefixes: Seq[Boolean] = Nil)
    extends UnaryExpression {
  require(terms.nonEmpty, "phrase needs at least one term")
  require(gaps.length == terms.length - 1, "need one gap per adjacent term pair")
  require(gaps.forall(_ >= 1), "gaps must be >= 1")
  require(prefixes.isEmpty || prefixes.length == terms.length,
    "need one prefix flag per term (or none)")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phrase_gap_match"

  // cumulative token offsets of each term relative to the first
  private val offsets: Array[Int] = gaps.scanLeft(0)(_ + _).toArray
  private val lowered: Array[String] = terms.map(_.toLowerCase).toArray
  // term j matches by startsWith instead of equality (tsquery `t:*`)
  private val pre: Array[Boolean] =
    (if (prefixes.isEmpty) terms.map(_ => false) else prefixes).toArray

  /** The per-row matcher (public: invoked from generated code). */
  def matches(text: UTF8String): Boolean = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val span = offsets(offsets.length - 1)
    val last = toks.length - 1 - span
    var i = 0
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < lowered.length) {
        val t = toks(i + offsets(j))
        ok = if (pre(j)) t.startsWith(lowered(j)) else t == lowered(j)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any): Any = matches(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseGapMatch", this,
      classOf[PhraseGapMatch].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.matches($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
