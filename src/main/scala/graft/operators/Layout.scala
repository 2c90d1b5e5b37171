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
