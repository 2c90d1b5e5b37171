package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Great-circle distance and radius search — the contrib/earthdistance
 * surface (ref: /root/reference/contrib/earthdistance/earthdistance.cpp
 * geo_distance — great-circle via lat/lon trig; earthdistance--1.0.sql
 * earth() = 6378168 m spherical radius, earth_distance(ll_to_earth…)).
 *
 * Distance: the haversine form (numerically stable for small angles,
 * same sphere model as earth_distance): a = sin²(Δφ/2) +
 * cosφ₁·cosφ₂·sin²(Δλ/2), d = 2R·asin(√a). Pure codegen'd trig — no
 * UDF.
 *
 * Scale design — [[radiusJoin]]: earthdistance answers "points within
 * radius" with a cube GiST index; the Spark-native equivalent is a
 * GRID-CELL EQUI-JOIN. One side maps to its (latCell, lonCell); the
 * other explodes to its cell plus the 8 neighbors (longitude wraps
 * mod the cell count); candidates equi-join on the cell key and the
 * exact haversine predicate filters. Cell sizes must dominate the
 * radius: Δlat ≥ r/111.19 km/°, Δlon ≥ r/(111.32·cos(maxAbsLat)).
 * Each (left, right) candidate appears exactly once — the probe side
 * contributes one row per DISTINCT neighbor cell and the build side
 * has one cell — so no dedup pass is needed. The join is a plain
 * shuffled hash join on an int-pair key: fully parallel, AQE-skewable,
 * O(n·9) exploded rows instead of O(n·m) theta pairs.
 */
object Geo {
  val EARTH_R = 6378168.0 // meters; earthdistance--1.0.sql earth()

  /** Haversine great-circle distance in meters on the earth() sphere. */
  def distanceMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = radians(lat1); val p2 = radians(lat2)
    val dphi = radians(lat2 - lat1) / 2.0
    val dlmb = radians(lon2 - lon1) / 2.0
    // sin·sin, not pow(sin,2): x*x is IEEE-exact in both engines,
    // Math.pow/duckdb pow are only ~2-ulp and needn't agree
    val a = sin(dphi) * sin(dphi) + cos(p1) * cos(p2) * sin(dlmb) * sin(dlmb)
    lit(2.0) * lit(EARTH_R) * asin(least(lit(1.0), sqrt(a)))
  }

  /**
   * Radius join: rows of `left` paired with rows of `right` within
   * `radiusMeters`, via the grid-cell equi-join above. Both inputs
   * need `latCol`/`lonCol` (degrees, |lat| ≤ maxAbsLat). Returns
   * left.* ++ right.* ++ dist_m. Cell widths are derived from the
   * radius with a safety margin and validated against maxAbsLat.
   */
  def radiusJoin(left: DataFrame, right: DataFrame,
                 latL: String, lonL: String, latR: String, lonR: String,
                 radiusMeters: Double, maxAbsLat: Double = 60.0): DataFrame = {
    val kmPerDegLat = 111.19
    val dLat = math.ceil(radiusMeters / 1000.0 / kmPerDegLat) + 1.0
    val kmPerDegLon = 111.32 * math.cos(math.toRadians(maxAbsLat))
    val dLon0 = math.ceil(radiusMeters / 1000.0 / kmPerDegLon) + 1.0
    // lon cells must tile 360° evenly for the wrap to be exact
    val nLon = math.max(1, (360.0 / dLon0).toInt)
    val dLon = 360.0 / nLon
    require(dLon * kmPerDegLon * 1000.0 >= radiusMeters,
      s"graft: lon cell ${dLon}° too small for radius at |lat|<=$maxAbsLat")

    // |lat| ≤ maxAbsLat is a correctness precondition (lon cells are
    // sized in degrees at maxAbsLat — beyond it they span fewer km
    // than the radius and pairs would be SILENTLY missed). Enforce it
    // at runtime inside the cell expression itself (not a droppable
    // side column Catalyst would prune away): out-of-range latitudes
    // raise instead of losing matches. (Corner: an out-of-range
    // LITERAL lat constant-folds to a null cell key before execution
    // and simply never joins — data columns, the real risk, raise.)
    def checkedLat(c: Column): Column =
      when(abs(c) <= lit(maxAbsLat), c).otherwise(raise_error(concat(
        lit(s"graft: radiusJoin |lat| > $maxAbsLat (pass a larger maxAbsLat): "),
        c.cast("string"))).cast("double"))
    def latCell(c: Column) = floor(checkedLat(c) / dLat).cast("int")
    def lonCell(c: Column) = pmod(floor((c + 180.0) / dLon).cast("int"), lit(nLon))

    val l = left
      .withColumn("_latc", latCell(col(latL)))
      .withColumn("_lonc", lonCell(col(lonL)))
    val neighbors = array((for (i <- -1 to 1; j <- -1 to 1) yield
      struct((latCell(col(latR)) + i).as("la"),
        pmod(lonCell(col(lonR)) + j, lit(nLon)).as("lo"))): _*)
    val r = right
      .withColumn("_cell", explode(array_distinct(neighbors)))
      .withColumn("_latc", col("_cell.la"))
      .withColumn("_lonc", col("_cell.lo"))
      .drop("_cell")
    l.join(r, Seq("_latc", "_lonc"))
      .withColumn("dist_m",
        distanceMeters(col(latL), col(lonL), col(latR), col(lonR)))
      .filter(col("dist_m") <= radiusMeters)
      .drop("_latc", "_lonc")
  }
}
