package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ts_rank_cd cover-density accumulation (reference:
 * src/common/backend/utils/adt/tsrank.cpp calc_rank_cd + Cover): walk
 * the document's query-term occurrence list, enumerate PG's minimal
 * covers (smallest windows containing every query term: extend up
 * from the search position until the term set is complete, shrink
 * down to the latest begin that keeps it complete, restart one past
 * the begin), and accumulate each cover's contribution.
 *
 * Under uniform D position weights (to_tsvector without setweight)
 * PG's per-cover arithmetic collapses exactly:
 *   InvSum  = entries · (1/0.1)
 *   Cpos    = entries / InvSum = 0.1
 *   nNoise  = (q − p) − (entries − 1)
 *   ΔWdoc   = Cpos / (1 + nNoise) = 0.1 / (q − p − entries + 2)
 * The denominator d = q − p − entries + 2 ≥ 1 is an INTEGER, so each
 * contribution is quantized to integer NANOS — round(1e8 / d) — and
 * the rank accumulates as an exact long (order-invariant; d ≤ token
 * count keeps 1e8/d away from .5 rounding boundaries, since a
 * half-boundary would need d to carry a factor 2⁹). The documented
 * deviation from PG is this ≤0.5e-9 per-cover quantization, traded
 * for a bit-exact cross-engine oracle.
 *
 * The scan runs in ONE compiled method per row (same discipline as
 * [[PhraseGapMatch]]): no interpreted HOFs, no position explode, and
 * whole-stage codegen stays intact — a 100 TB rank is a map-only scan.
 * Returns nanos (LongType); divide by 1e9 for the rank.
 */
case class CoverDensity(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "cover density needs at least one term")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cover_density"

  private val lowered: Array[String] = terms.map(_.toLowerCase).distinct.toArray
  private val nTerms = lowered.length

  /** Per-row accumulator (public: invoked from generated code). */
  def nanos(text: UTF8String): Long = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    // occurrence list: (1-based position, term id), position-ordered
    var m = 0
    val pos = new Array[Int](toks.length)
    val tid = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      var t = 0
      while (t < nTerms) {
        if (toks(i) == lowered(t)) {
          pos(m) = i + 1; tid(m) = t; m += 1; t = nTerms
        } else t += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    val seen = new Array[Int](nTerms)
    var total = 0L
    var start = 0
    var searching = true
    while (searching) {
      // extend up from `start` until every term is present
      java.util.Arrays.fill(seen, 0)
      var distinct = 0
      var end = start - 1
      while (distinct < nTerms && end + 1 < m) {
        end += 1
        if (seen(tid(end)) == 0) distinct += 1
        seen(tid(end)) += 1
      }
      if (distinct < nTerms) searching = false
      else {
        // shrink: latest begin keeping [begin..end] complete
        java.util.Arrays.fill(seen, 0)
        distinct = 0
        var begin = end + 1
        while (distinct < nTerms) {
          begin -= 1
          if (seen(tid(begin)) == 0) distinct += 1
          seen(tid(begin)) += 1
        }
        val entries = end - begin + 1
        val d = pos(end) - pos(begin) - entries + 2
        total += math.round(1.0e8 / d)
        start = begin + 1
      }
    }
    total
  }

  override def nullSafeEval(a: Any): Any = nanos(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coverDensity", this,
      classOf[CoverDensity].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.nanos($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
