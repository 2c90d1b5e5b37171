package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Weighted calc_rank_or per-term contributions in integer nanos — the
 * compiled kernel behind FullText.tsRankWeighted (ref: tsrank.cpp
 * calc_rank_or with non-uniform wpos). One pass over the token array
 * per row computes, for every query term simultaneously: the
 * occurrence-indexed sum Σ round(wpos_j·1e9/j²), PG's first-strict-max
 * (wjm, jm), and the final per-term contribution
 * wjmN + resj − round(wjmN/jm²). Title zone = 1-based token position
 * ≤ titleTokens at weight A (1.0), body at D (0.1).
 *
 * Replaces a 3-term interpreted HOF chain (transform/filter/zip_with/
 * aggregate per term — measured 1.5 s at sf0.1) with one compiled scan
 * invoked straight from generated code: no per-term array
 * materialization, whole-stage codegen intact. Arithmetic is
 * IDENTICAL to the HOF formulation the SQL oracle mirrors (same
 * rounding, same strict-max rule), so the gate stays hash-exact.
 *
 * Returns array<long> of per-term nanos in `terms` order; the Column
 * layer divides each by 1e9·(π²/6) in fixed term order.
 */
case class WeightedRankNanos(child: Expression, terms: Seq[String],
    titleTokens: Int) extends UnaryExpression {
  require(terms.nonEmpty, "weighted rank needs at least one term")
  require(titleTokens >= 0, "titleTokens must be >= 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "weighted_rank_nanos"

  private val lowered: Array[String] = terms.map(_.toLowerCase).toArray

  /** Per-row kernel (public: invoked from generated code). */
  def nanosArr(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val nT = lowered.length
    val res = new Array[Long](nT)
    val occ = new Array[Int](nT)
    val wjmN = new Array[Long](nT)
    val jm = new Array[Int](nT)
    var i = 0
    while (i < toks.length) {
      var t = 0
      while (t < nT) {
        if (toks(i) == lowered(t)) {
          occ(t) += 1
          val j = occ(t)
          val w = if (i + 1 <= titleTokens) 1000000000L else 100000000L
          res(t) += math.round(w.toDouble / (j.toDouble * j))
          if (w > wjmN(t)) { wjmN(t) = w; jm(t) = j } // PG's strict >
          t = nT
        } else t += 1
      }
      i += 1
    }
    val out = new Array[Long](nT)
    var t = 0
    while (t < nT) {
      out(t) = if (occ(t) == 0) 0L
        else wjmN(t) + res(t) -
          math.round(wjmN(t).toDouble / (jm(t).toDouble * jm(t)))
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = nanosArr(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightedRankNanos", this,
      classOf[WeightedRankNanos].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.nanosArr($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
