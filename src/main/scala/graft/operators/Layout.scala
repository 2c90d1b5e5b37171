package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) data layout — multi-dimensional clustering for
 * data skipping. A table range-partitioned and sorted by the
 * interleaved-bit z-value keeps rows close in BOTH dimensions close
 * in file order, so parquet min/max stats prune scans filtered on
 * either column (the OPTIMIZE ZORDER idea; Morton 1966).
 *
 * `zValue` is pure integer Column arithmetic (codegen'd; bit i of x
 * lands at output bit 2i, bit i of y at 2i+1), so the z-key and the
 * static bucket assignment are exactly reproducible in plain SQL —
 * which is what lets the layout be GATED hash-exact. `clusterByZ` is
 * the production writer path: repartitionByRange on the z-value +
 * sortWithinPartitions, whose sampled range boundaries are
 * plan-dependent — correct but not oracle-hashable, so the gate uses
 * the arithmetic `bucket` split instead.
 */
object Layout {

  /** Morton interleave of the low `bits` bits of x and y (both must
    * be non-negative; callers mod-reduce into range first). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** z-value + static equal-width bucket in [0, nBuckets) — the
    * deterministic (gate-able) bucketing over the 2^(2·bits) z-range. */
  def zorderBuckets(df: DataFrame, xCol: String, yCol: String,
      bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && nBuckets.toLong <= (1L << (62 - 2 * bits)),
      "nBuckets overflows the bucket arithmetic")
    val z = zValue(col(xCol), col(yCol), bits)
    // bucket = floor(z·nBuckets / 2^(2·bits)) as a pure integer shift
    df.withColumn("zval", z)
      .withColumn("bucket",
        shiftright(col("zval") * lit(nBuckets.toLong), 2 * bits).cast("int"))
  }

  /**
   * Hilbert-curve index of (x, y) on a 2^bits × 2^bits grid — the
   * locality-better alternative to Morton for clustered layouts
   * (consecutive Hilbert indices are ALWAYS grid-adjacent, so every
   * file covers one connected region; Morton's curve jumps at quadrant
   * seams). The standard xy2d walk (Hilbert 1891; the bit-rotation
   * form is the classic public-domain convert): per bit plane s from
   * high to low, d += s²·((3·rx) xor ry), then rotate/reflect the
   * quadrant. Compiled as a native loop expression
   * ([[graft.functions.HilbertIndex]]) and emitted IDENTICALLY as SQL
   * by [[hilbertSql]] so the layout gates hash-exact against the
   * oracle. (The first formulation self-composed the per-plane Column
   * trees — ~3-4× expression growth per plane, 8 planes fell out of
   * codegen entirely and cost 225+ s interpreted at sf0.1; the loop
   * form is ~0.4 s. The lesson: an iterated bit-plane fold must be a
   * loop in ONE expression, never a tree-of-trees.)
   */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.HilbertIndex(
      org.apache.spark.sql.graft.Bridge.expression(x.cast("long")),
      org.apache.spark.sql.graft.Bridge.expression(y.cast("long")), bits))

  /** The SQL twin of [[hilbertValue]]: a chain of CTE steps (one per
    * bit plane) over `xExpr`/`yExpr`, for the DuckDB oracle. Returns
    * (cteChainSql, finalDColumnName); prepend after a base CTE named
    * `baseName` exposing xExpr/yExpr AS x0/y0 plus `carryCols`. */
  def hilbertSql(bits: Int, baseName: String, carryCols: String): String = {
    require(bits >= 1 && bits <= 15)
    val sb = new StringBuilder
    var s = 1L << (bits - 1)
    var step = 0
    var prev = baseName
    while (s > 0) {
      val i = step
      val rx = s"(CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END)"
      val dPrev = if (i == 0) "0" else s"d$i"
      sb.append(
        s"""h${i + 1} AS (SELECT $carryCols,
           |  $dPrev + ${s * s} * xor(3 * $rx, $ry) AS d${i + 1},
           |  CASE WHEN $ry = 0 THEN
           |    CASE WHEN $rx = 1 THEN ${s - 1} - y$i ELSE y$i END
           |    ELSE x$i END AS x${i + 1},
           |  CASE WHEN $ry = 0 THEN
           |    CASE WHEN $rx = 1 THEN ${s - 1} - x$i ELSE x$i END
           |    ELSE y$i END AS y${i + 1}
           |  FROM $prev),
           |""".stripMargin)
      prev = s"h${i + 1}"
      step += 1
      s >>= 1
    }
    // the last CTE in the chain is h<bits>, its index column d<bits>
    sb.toString
  }

  /** Production layout writer shape: range-repartition by z-value and
    * sort within partitions — each output file covers a tight z-range,
    * i.e. a small rectangle in (x, y), so min/max stats prune on both
    * columns. Boundaries come from Spark's range sampler (correct, not
    * bit-reproducible — use zorderBuckets for oracle-gated splits). */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      bits: Int, nFiles: Int): DataFrame = {
    val withZ = df.withColumn("zval", zValue(col(xCol), col(yCol), bits))
    withZ.repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
