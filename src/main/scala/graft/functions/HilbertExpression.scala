package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Hilbert curve index (xy2d, Hilbert 1891) of the low `bits` bit
 * planes of (x, y) — compiled as a straight Java loop.
 *
 * The original Column formulation self-composed the per-plane
 * rotate/reflect trees (each plane references BOTH running coordinates
 * 3-4 times), so the expression grew ~3-4× per plane: at 8 planes it
 * fell out of whole-stage codegen entirely and evaluated a several-
 * thousand-node interpreted tree per row — 225-430 s for the sf0.1
 * layout gate vs ~0.4 s compiled here (the r11 driver-bench timeout's
 * root cause). Same values, loop instead of tree.
 *
 * Semantics are pinned by [[graft.operators.Layout.hilbertSql]] (the
 * DuckDB CTE chain computes the identical plane walk) and LayoutSpec's
 * bijectivity + unit-step adjacency over the full 64×64 curve.
 */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 15, "bits must be in [1,15]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = graft.functions.HilbertIndex.xy2d($x, $y, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** The classic xy2d plane walk — the exact arithmetic of
    * Layout.hilbertSql's CTE chain (rotate/reflect then swap). */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        // reflect (when rx==1) then swap — matches the SQL twin:
        //   x' = rx==1 ? s-1-y : y ;  y' = rx==1 ? s-1-x : x
        val nx = if (rx == 1L) s - 1L - y else y
        val ny = if (rx == 1L) s - 1L - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }
}
