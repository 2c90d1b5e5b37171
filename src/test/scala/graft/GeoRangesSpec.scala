package graft

import graft.operators.{Geo, Ranges}
import org.apache.spark.sql.functions._

/**
 * Geo haversine + grid radius join, and range-type ops + bucket-tiled
 * overlap join, pinned against closed-form values and brute-force
 * equivalents (incl. longitude wrap and cross-bucket intervals).
 */
class GeoRangesSpec extends SparkSpec {
  import spark.implicits._

  private def dist(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq(1).toDF("x").select(Geo.distanceMeters(lit(lat1), lit(lon1),
      lit(lat2), lit(lon2)).as("d")).as[Double].head()

  test("haversine matches closed-form sphere values") {
    // 1° of longitude on the equator = 2πR/360
    val oneDeg = 2 * math.Pi * Geo.EARTH_R / 360
    assert(math.abs(dist(0, 0, 0, 1) - oneDeg) < 1.0)
    // 90° pole-to-equator arc = quarter circumference / ... 90° of lat
    assert(math.abs(dist(0, 0, 90, 0) - 90 * oneDeg) < 1.0)
    // antipodal = half circumference
    assert(math.abs(dist(0, 0, 0, 180) - 180 * oneDeg) < 1.0)
    // symmetric
    assert(dist(10, 20, 30, 40) == dist(30, 40, 10, 20))
    assert(dist(12, 34, 12, 34) == 0.0)
  }

  test("radiusJoin equals brute force, incl. longitude wrap") {
    val left = ((1 to 40).map { i =>
      (i.toLong, (i * 37 % 121 - 60).toDouble, (i * 53 % 360 - 180).toDouble)
    } ++ Seq((200L, 10.0, 179.8))) // planted: guarantees a cross-line pair
      .toDF("lid", "c_lat", "c_lon")
    // force wrap cases: points hugging the date line on both sides
    val right = ((1 to 25).map { i =>
      (i.toLong, (i * 41 % 121 - 60).toDouble, (i * 59 % 360 - 180).toDouble)
    } ++ Seq((100L, 10.0, 179.5), (101L, 10.0, -179.5), (102L, 59.9, 0.0)))
      .toDF("rid", "s_lat", "s_lon")
    val r = 2000000.0
    val got = Geo.radiusJoin(left, right, "c_lat", "c_lon", "s_lat", "s_lon", r)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.crossJoin(right)
      .withColumn("d", Geo.distanceMeters(col("c_lat"), col("c_lon"),
        col("s_lat"), col("s_lon")))
      .filter(col("d") <= r)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
    // wrap pair must actually be exercised: left 200 sits at 179.8°,
    // right 101 at −179.5° — 0.7° apart at lat 10 (~77 km), well
    // inside the 2000 km radius, and the pair CROSSES the date line
    // (cells wrap mod nLon). Pin it so the wrap path can't go dark.
    val wrapHits = want.count { case (lid, rid) => lid == 200L && rid == 101L }
    assert(wrapHits >= 1)
    assert(got.contains((200L, 101L)))
  }

  test("range ops: empty-awareness and intersection") {
    def r1(c: org.apache.spark.sql.Column): Boolean =
      Seq(1).toDF("x").select(c.as("r")).as[Boolean].head()
    assert(r1(Ranges.overlaps(lit(1L), lit(5L), lit(4L), lit(9L))))
    assert(!r1(Ranges.overlaps(lit(1L), lit(5L), lit(5L), lit(9L))))
    // empty range overlaps nothing, even "inside" another
    assert(!r1(Ranges.overlaps(lit(3L), lit(3L), lit(1L), lit(9L))))
    assert(r1(Ranges.containsRange(lit(1L), lit(9L), lit(3L), lit(3L)))) // empty ⊆ r
    assert(r1(Ranges.containsRange(lit(1L), lit(9L), lit(2L), lit(8L))))
    assert(!r1(Ranges.containsRange(lit(1L), lit(9L), lit(2L), lit(10L))))
    assert(r1(Ranges.adjacent(lit(1L), lit(5L), lit(5L), lit(9L))))
    assert(!r1(Ranges.adjacent(lit(1L), lit(5L), lit(6L), lit(9L))))
    assert(!r1(Ranges.adjacent(lit(5L), lit(5L), lit(5L), lit(9L)))) // empty adj nothing
    assert(r1(Ranges.containsElem(lit(1L), lit(5L), lit(1L))))
    assert(!r1(Ranges.containsElem(lit(1L), lit(5L), lit(5L))))
  }

  test("overlapJoin equals brute force incl. cross-bucket and long intervals") {
    // intervals spanning multiple width-8 buckets, several keys
    val rows = Seq(
      (1L, 1L, 0L, 5L), (2L, 1L, 3L, 20L), (3L, 1L, 19L, 21L),
      (4L, 1L, 30L, 31L), (5L, 2L, 0L, 40L), (6L, 2L, 39L, 41L),
      (7L, 2L, 41L, 50L), (8L, 3L, 7L, 9L), (9L, 3L, 8L, 16L))
    val l = rows.toDF("ok1", "ck1", "lo1", "hi1")
    val r = rows.toDF("ok2", "ck2", "lo2", "hi2")
    val got = Ranges.overlapJoin(l, r, "ck1", "ck2", "lo1", "hi1", "lo2", "hi2", 8L)
      .filter(col("ok1") < col("ok2"))
      .select("ok1", "ok2").as[(Long, Long)].collect().toSet
    val want = (for {
      (a, ka, la, ha) <- rows; (b, kb, lb, hb) <- rows
      if a < b && ka == kb && math.max(la, lb) < math.min(ha, hb)
    } yield (a, b)).toSet
    assert(got == want && want.nonEmpty)
    // and exactly-once: no pair duplicated across buckets
    val withDups = Ranges.overlapJoin(l, r, "ck1", "ck2", "lo1", "hi1", "lo2", "hi2", 8L)
      .filter(col("ok1") < col("ok2"))
      .select("ok1", "ok2").as[(Long, Long)].collect().toSeq
    assert(withDups.size == withDups.toSet.size)
  }

  test("overlapJoin drops empty/inverted intervals before tiling") {
    // a badly inverted interval (hi << lo) must neither explode into
    // |lo-hi|/width bucket rows nor join anything (empty-range
    // contract); width 8 → a descending sequence would be ~12M rows
    val l = Seq((1L, 1L, 0L, 10L), (2L, 1L, 100000000L, 0L), (3L, 1L, 5L, 5L))
      .toDF("ok1", "ck1", "lo1", "hi1")
    val r = Seq((10L, 1L, 0L, 100000000L)).toDF("ok2", "ck2", "lo2", "hi2")
    val got = Ranges.overlapJoin(l, r, "ck1", "ck2", "lo1", "hi1",
        "lo2", "hi2", 8L)
      .select("ok1", "ok2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L))) // inverted 2 and empty 3 join nothing
  }

  test("radiusJoin raises on |lat| beyond maxAbsLat instead of missing pairs") {
    val l = Seq((1L, 75.0, 0.0)).toDF("lid", "c_lat", "c_lon") // polar row
    val r = Seq((2L, 74.0, 0.0)).toDF("rid", "s_lat", "s_lon")
    val ex = intercept[Exception] {
      Geo.radiusJoin(l, r, "c_lat", "c_lon", "s_lat", "s_lon",
        500000.0, maxAbsLat = 60.0).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("radiusJoin |lat| >")))
    // and within the bound the same rows join fine
    assert(Geo.radiusJoin(l, r, "c_lat", "c_lon", "s_lat", "s_lon",
      500000.0, maxAbsLat = 80.0).count() == 1L)
  }
}
