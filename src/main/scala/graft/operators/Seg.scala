package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * contrib/seg — 1-D line segments (numeric intervals) with PG's exact
 * operator semantics (reference: contrib/seg/seg.cpp — seg_left
 * :503-506 upper(a) < lower(b); seg_right :510-513 lower(a) >
 * upper(b); seg_over_left :496-499 upper(a) ≤ upper(b); seg_over_right
 * :517-520 lower(a) ≥ lower(b); seg_union :522 min-lower/max-upper;
 * seg_inter :553 max-lower/min-upper; seg_center :156-161
 * (lower+upper)/2; text form `lo .. hi`, a point renders as its
 * single value).
 *
 * A seg is just a (lo, hi) column pair — the closed numeric interval
 * the reference stores as two float4s. Everything here is a pure
 * codegen Column expression (map-only at any scale); interval JOINS
 * reuse the banded [[Ranges.overlapJoin]] machinery, which is why
 * this module carries no join of its own.
 */
object Seg {

  /** a strictly left of b: upper(a) < lower(b). */
  def left(aHi: Column, bLo: Column): Column = aHi < bLo

  /** a strictly right of b: lower(a) > upper(b). */
  def right(aLo: Column, bHi: Column): Column = aLo > bHi

  /** a &< b — a does not extend right of b: upper(a) <= upper(b). */
  def overLeft(aHi: Column, bHi: Column): Column = aHi <= bHi

  /** a &> b — a does not extend left of b: lower(a) >= lower(b). */
  def overRight(aLo: Column, bLo: Column): Column = aLo >= bLo

  /** a && b — overlap. Segs are CLOSED intervals (unlike the
    * half-open [[Ranges]]): endpoints touching IS overlap. */
  def overlaps(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    aLo <= bHi && bLo <= aHi

  /** a @> b — a contains b: lower(a) ≤ lower(b) ∧ upper(a) ≥ upper(b)
    * (seg.cpp :468-471). */
  def contains(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    aLo <= bLo && aHi >= bHi

  /** a = b (both endpoints equal). */
  def same(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    aLo === bLo && aHi === bHi

  /** Union bounding segment: (min lower, max upper). */
  def union(aLo: Column, aHi: Column, bLo: Column, bHi: Column): (Column, Column) =
    (least(aLo, bLo), greatest(aHi, bHi))

  /** Intersection: (max lower, min upper) — lo > hi when disjoint,
    * exactly the reference's raw result (callers test overlap first). */
  def inter(aLo: Column, aHi: Column, bLo: Column, bHi: Column): (Column, Column) =
    (greatest(aLo, bLo), least(aHi, bHi))

  /** Segment size (upper - lower), as a double. */
  def size(lo: Column, hi: Column): Column =
    hi.cast("double") - lo.cast("double")

  /** Segment center, the reference's (lower+upper)/2. */
  def center(lo: Column, hi: Column): Column =
    (lo.cast("double") + hi.cast("double")) / expr("2e0")

  /** seg_cmp total order: by lower, then upper (for ORDER BY / sort
    * keys: order by these two columns). */
  def cmpKeys(lo: Column, hi: Column): Seq[Column] = Seq(lo, hi)

  /**
   * seg_in, the common forms: `x` (point), `x .. y`, `>x`, `<x`, with
   * an optional `~` approximation marker that is stored-but-ignored
   * by every operator (the reference's documented behavior). Open
   * ends surface as null lo / null hi. Returns a struct(lo, hi).
   */
  def parse(text: Column): Column = {
    val t = regexp_replace(trim(text), "~", "")
    // a STRICT numeric token — a permissive class like [0-9.eE+-]+
    // would accept "3-4" or "1.2.3", cast them to null, and emit a
    // non-null struct(null, null) indistinguishable from success;
    // with this pattern every match casts cleanly, so unparseable
    // input always lands in the null-struct `otherwise` branch
    val num = "[+-]?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
    val range = regexp_extract(t, s"^\\s*($num)\\s*\\.\\.\\s*($num)\\s*$$", 1)
    val rangeHi = regexp_extract(t, s"^\\s*($num)\\s*\\.\\.\\s*($num)\\s*$$", 2)
    val gt = regexp_extract(t, s"^\\s*>\\s*($num)\\s*$$", 1)
    val lt = regexp_extract(t, s"^\\s*<\\s*($num)\\s*$$", 1)
    val point = regexp_extract(t, s"^\\s*($num)\\s*$$", 1)
    when(range =!= "", struct(range.cast("double").as("lo"), rangeHi.cast("double").as("hi")))
      .when(gt =!= "", struct(gt.cast("double").as("lo"), lit(null).cast("double").as("hi")))
      .when(lt =!= "", struct(lit(null).cast("double").as("lo"), lt.cast("double").as("hi")))
      .when(point =!= "", struct(point.cast("double").as("lo"), point.cast("double").as("hi")))
      .otherwise(lit(null).cast("struct<lo:double,hi:double>"))
  }

  /** seg_out: a point renders as its single value, a range as
    * `lo .. hi`, open ends as `>lo` / `<hi`. */
  def render(lo: Column, hi: Column): Column =
    when(lo.isNull && hi.isNotNull, concat(lit("<"), hi.cast("string")))
      .when(hi.isNull && lo.isNotNull, concat(lit(">"), lo.cast("string")))
      .when(lo === hi, lo.cast("string"))
      .otherwise(concat(lo.cast("string"), lit(" .. "), hi.cast("string")))
}
