package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range types — PG/openGauss range semantics (ref: src/common/backend/
 * utils/adt/rangetypes.cpp: range_overlaps, range_contains_elem,
 * range_adjacent, range_intersect; discrete ranges canonicalize to
 * [lo, hi) — rangetypes.cpp int4range canonical form), re-expressed as
 * closed-form integer column arithmetic over (lo, hi) pairs. All ops
 * are empty-range aware: a range with lo >= hi is empty and overlaps /
 * contains / is-adjacent-to nothing.
 *
 * Scale design — [[overlapJoin]]: a global interval-overlap join can't
 * be an equi-join on any single column. The Spark-native device is
 * BUCKET TILING: each interval explodes to the fixed-width buckets it
 * spans (O(len/Δ) rows, bounded when interval length is bounded), the
 * candidate join is a plain equi-join on (key, bucket), and each
 * overlapping pair is counted EXACTLY ONCE by keeping it only in the
 * bucket containing the overlap start, greatest(lo₁, lo₂). No theta
 * join, no window, no dedup shuffle.
 */
object Ranges {
  /** [lo,hi) ∋ x */
  def containsElem(lo: Column, hi: Column, x: Column): Column =
    lo <= x && x < hi

  /** [lo1,hi1) && [lo2,hi2) — empty ranges overlap nothing. */
  def overlaps(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    greatest(lo1, lo2) < least(hi1, hi2)

  /** range_contains: [lo1,hi1) ⊇ [lo2,hi2); an empty range is
    * contained in anything (rangetypes.cpp: empty ⊆ r for all r). */
  def containsRange(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    (lo2 >= hi2) || (lo1 <= lo2 && hi2 <= hi1)

  /** range_adjacent: -|- touching without overlap; empty ranges are
    * adjacent to nothing. */
  def adjacent(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    lo1 < hi1 && lo2 < hi2 && (hi1 === lo2 || hi2 === lo1)

  /** Intersection [max(lo), min(hi)); canonical empty = (0, 0). */
  def intersect(lo1: Column, hi1: Column, lo2: Column, hi2: Column): (Column, Column) = {
    val lo = greatest(lo1, lo2); val hi = least(hi1, hi2)
    (when(lo < hi, lo).otherwise(lit(0)), when(lo < hi, hi).otherwise(lit(0)))
  }

  /**
   * Overlap self/2-table join on long-valued [lo, hi) intervals,
   * additionally equi-keyed by `key` columns. `bucketWidth` must be ≥
   * the longest interval on either side for the ≤2-buckets-per-row
   * bound; correctness holds for any width. Returns candidate pairs
   * (all left cols, all right cols) — each overlapping pair exactly
   * once.
   */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  keyL: String, keyR: String,
                  loL: String, hiL: String, loR: String, hiR: String,
                  bucketWidth: Long): DataFrame = {
    require(Set(keyL, loL, hiL).intersect(Set(keyR, loR, hiR)).isEmpty,
      "graft: overlapJoin needs disjoint left/right column names")
    def tiles(lo: String, hi: String): Column =
      // buckets floor(lo/Δ) .. floor((hi-1)/Δ)   (hi exclusive)
      sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor((col(hi) - 1) / bucketWidth).cast("long"))
    // empty/inverted intervals (hi ≤ lo) overlap nothing by the
    // module's contract — and Spark's sequence(start, stop) would
    // generate a DESCENDING range for them, exploding |lo−hi|/Δ
    // spurious bucket rows before the predicate filters them out.
    // Drop them before tiling.
    val l = left.filter(col(loL) < col(hiL))
      .withColumn("_bl", explode(tiles(loL, hiL)))
    val r = right.filter(col(loR) < col(hiR))
      .withColumn("_br", explode(tiles(loR, hiR)))
    l.join(r, col("_bl") === col("_br") && col(keyL) === col(keyR) &&
        greatest(col(loL), col(loR)) < least(col(hiL), col(hiR)) &&
        // count each pair once: only in the bucket of the overlap start
        col("_bl") === floor(greatest(col(loL), col(loR)) / bucketWidth)
          .cast("long"))
      .drop("_bl", "_br")
  }
}
