package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * N-dimensional boxes — the contrib/cube surface (ref:
 * /root/reference/contrib/cube/cube.cpp: cube_contains/cube_overlap
 * per-dim interval tests, cube_union_v0 elementwise min/max,
 * cube_inter elementwise max/min WITHOUT canonicalization — a
 * disjoint intersection stays inverted, exactly like the reference —
 * and cube_distance = sqrt(Σ distance_1D²) where distance_1D is the
 * per-dimension gap, 0 when the intervals overlap).
 *
 * Representation: a box is two equal-length `array<double>` columns
 * (ll, ur); corners may arrive unordered — every op normalizes with
 * least/greatest per dimension first, as the reference does. Mixed
 * dimensionality (cube.cpp's zero-padding) is not modeled: callers
 * align dimensions up front, which a relational pipeline does anyway.
 * All ops are per-row HOF expressions over bounded-length arrays —
 * no joins, no shuffles; a box-overlap JOIN composes the
 * [[Geo.radiusJoin]] / [[Ranges.overlapJoin]] grid devices per
 * dimension.
 */
object Boxes {
  private def lo(a: Column, b: Column): Column = zip_with(a, b, (x, y) => least(x, y))
  private def hi(a: Column, b: Column): Column = zip_with(a, b, (x, y) => greatest(x, y))

  /** cube_contains(a, b): box a contains box b (per-dim nesting). */
  def contains(ll1: Column, ur1: Column, ll2: Column, ur2: Column): Column = {
    val (a1, b1) = (lo(ll1, ur1), hi(ll1, ur1))
    val (a2, b2) = (lo(ll2, ur2), hi(ll2, ur2))
    forall(zip_with(a1, a2, (x, y) => x <= y), identity) &&
      forall(zip_with(b1, b2, (x, y) => x >= y), identity)
  }

  /** cube_overlap: closed-interval overlap in every dimension. */
  def overlaps(ll1: Column, ur1: Column, ll2: Column, ur2: Column): Column = {
    val (a1, b1) = (lo(ll1, ur1), hi(ll1, ur1))
    val (a2, b2) = (lo(ll2, ur2), hi(ll2, ur2))
    forall(zip_with(hi(a1, a2), lo(b1, b2), (l, h) => l <= h), identity)
  }

  /** cube_union: elementwise (min ll, max ur). */
  def union(ll1: Column, ur1: Column, ll2: Column, ur2: Column): (Column, Column) =
    (lo(lo(ll1, ur1), lo(ll2, ur2)), hi(hi(ll1, ur1), hi(ll2, ur2)))

  /** cube_inter: elementwise (max ll, min ur) — stays inverted when
    * disjoint, like the reference (no canonicalization). */
  def inter(ll1: Column, ur1: Column, ll2: Column, ur2: Column): (Column, Column) =
    (hi(lo(ll1, ur1), lo(ll2, ur2)), lo(hi(ll1, ur1), hi(ll2, ur2)))

  /** cube_distance: sqrt of summed squared per-dimension gaps. */
  def distance(ll1: Column, ur1: Column, ll2: Column, ur2: Column): Column =
    sqrt(distance2(ll1, ur1, ll2, ur2))

  /** Squared distance — exact (integer-valued for integer corners). */
  def distance2(ll1: Column, ur1: Column, ll2: Column, ur2: Column): Column = {
    val (a1, b1) = (lo(ll1, ur1), hi(ll1, ur1))
    val (a2, b2) = (lo(ll2, ur2), hi(ll2, ur2))
    // gap_i = max(0, a2-b1, a1-b2); overlapping dims contribute 0
    val gaps = zip_with(zip_with(a2, b1, (x, y) => x - y),
      zip_with(a1, b2, (x, y) => x - y),
      (g1, g2) => greatest(g1, g2, lit(0.0)))
    aggregate(gaps, lit(0.0), (acc, g) => acc + g * g)
  }
}
