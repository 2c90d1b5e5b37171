package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Seasonal-trend decomposition, forecasting, and rolling anomaly
 * detection over bucketed event series — the deterministic,
 * distributable core of the reference's time-series AI surface
 * (prophet_fit/prophet_predict, ref: src/gausskernel/dbmind/deepsql/
 * madlib_modules/facebook_prophet/prophet_alg.py_in — trend +
 * periodic seasonality fit/predict; the dbmind kernel ships the same
 * shape for metric anomaly flagging).
 *
 * The reference delegates to the Prophet library on a SINGLE node and
 * documents the 1 GB ceiling in its own header ("if your dataset is
 * much larger... use models that train in-parallel"). This is the
 * in-parallel re-expression: classical additive decomposition
 * (Cleveland-style: centered 2×m moving-average trend, per-phase mean
 * seasonality, residual) whose every stage is a groupBy or a bounded
 * window — no driver-side series ever materializes.
 *
 * Scale shape: the raw 100 TB event stream collapses FIRST through a
 * map-side-combinable groupBy to one row per (key, bucket) — series
 * length is time-span/step, independent of event volume. Every later
 * stage (MA window, per-phase means, OLS sums, rolling z-score) runs
 * on that bounded series, partitioned by key: adding keys adds
 * parallelism, never wall-clock.
 *
 * Determinism (the cross-engine hash-exact discipline): bucket values
 * are exact LONG cents/counts; the MA trend, per-phase seasonal means
 * and OLS moments are kept as exact integer NUMERATORS over known
 * denominators for as long as possible; each emitted double is ONE
 * shared-text IEEE expression over those integers, so DuckDB builds
 * the identical tree. No raw-double sum ever crosses a shuffle.
 */
object Seasonal {

  /**
   * Dense hourly series per key: (key, bucket, y) where y is the exact
   * LONG cents sum (round(value*100)) over the bucket, 0 where the
   * bucket is empty. The grid spans each key's own [min,max] bucket —
   * no global calendar cross join (same contract as
   * TimeSeries.gapFillLocf).
   *
   * Buckets are EPOCH-ALIGNED (`unix_timestamp DIV step · step`), not
   * session-timezone date_trunc: every bucket is exactly `step`
   * seconds from its neighbors, so the downstream phase arithmetic
   * (epoch DIV step mod m) and forecast steps (timestampadd SECOND)
   * stay on the grid in ANY session timezone — date_trunc buckets
   * drift 23/25-hour at DST transitions and sit at :30 offsets in
   * half-hour zones. In a UTC session the two are identical.
   */
  def hourlySeries(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val observed = df
      .select(col(keyCol).as("key"), epochBucket(col(tsCol), 3600L).as("bucket"),
        expr(s"CAST(round($valueCol * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("key"), col("bucket"))
      .agg(sum(col("cents")).as("y_obs"))
    grid(observed).join(observed, Seq("key", "bucket"), "left_outer")
      .select(col("key"), col("bucket"), coalesce(col("y_obs"), lit(0L)).as("y"))
  }

  /** Dense hourly COUNT series per key (rate anomalies / forecasting
    * on volume rather than value). */
  def hourlyCounts(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val observed = df
      .select(col(keyCol).as("key"), epochBucket(col(tsCol), 3600L).as("bucket"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("y_obs"))
    grid(observed).join(observed, Seq("key", "bucket"), "left_outer")
      .select(col("key"), col("bucket"), coalesce(col("y_obs"), lit(0L)).as("y"))
  }

  /** Dense daily COUNT series per key (weekly seasonality inputs). */
  def dailyCounts(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val observed = df
      .select(col(keyCol).as("key"), epochBucket(col(tsCol), 86400L).as("bucket"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("y_obs"))
    grid(observed, 86400L).join(observed, Seq("key", "bucket"), "left_outer")
      .select(col("key"), col("bucket"), coalesce(col("y_obs"), lit(0L)).as("y"))
  }

  /** Timestamp floored to a fixed `step`-second epoch boundary —
    * timezone-free, unlike date_trunc (= UTC date_trunc for 3600/86400). */
  private def epochBucket(ts: Column, step: Long): Column = {
    val e = unix_timestamp(ts)
    timestamp_seconds(e - pmod(e, lit(step)))
  }

  private def grid(observed: DataFrame, stepSeconds: Long = 3600L): DataFrame =
    observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(
        unix_timestamp(col("lo")), unix_timestamp(col("hi")),
        lit(stepSeconds))).as("e"))
      .select(col("key"), timestamp_seconds(col("e")).as("bucket"))

  /** Trend-MA half-width and the exact-integer trend/seasonal
    * denominator: even m uses the classical 2×m MA (half-weight
    * endpoints, denominator 2m); odd m the plain centered m-MA
    * (denominator m). */
  private def trendParams(period: Int): (Int, Long) =
    if (period % 2 == 0) (period / 2, 2L * period) else ((period - 1) / 2, period.toLong)

  /**
   * Classical additive decomposition, any period m ≥ 2: trend via the
   * centered moving average (even m — the 2×m MA with endpoint
   * half-weights, numerator tnum = 2·Σ±h(y) − y₋ₕ − y₊ₕ over
   * denominator 2m; odd m — the plain centered m-MA over denominator
   * m), seasonal via centered per-phase means of the detrended
   * series, residual as the exact remainder. Phase = EPOCH-HOUR mod m — globally aligned and
   * valid for ANY period (hour-of-day mod m would never reach phases
   * ≥ 24 for m > 24); at m = 24 it equals UTC hour of day.
   *
   * Seasonal means are computed over the first floor(N/m)·m
   * trend-defined rows per key — a span of whole periods, so every
   * phase contributes the SAME count mk and the centering (subtract
   * the phase-mean average) stays a pure integer: over denominator
   * 2m·mk·m. Output doubles divide those integers once.
   *
   * Input: dense series (key, bucket, y: LONG) from hourlySeries/
   * hourlyCounts. Output: (key, bucket, y, trend, seasonal, resid)
   * with trend/resid null on the half-window edges.
   */
  def decompose(series: DataFrame, period: Int,
      stepSeconds: Long = 3600L): DataFrame = {
    val (_, denom) = trendParams(period)
    decomposedParts(series, period, stepSeconds)
      .select(col("key"), col("bucket"), col("y"),
        expr(s"CAST(tnum AS DOUBLE) / ${denom}e0").as("trend"),
        expr(s"CAST(cnum AS DOUBLE) / (${denom}e0 * CAST(mk AS DOUBLE) * ${period}e0)")
          .as("seasonal"),
        expr(s"""CAST(${denom} * mk * $period * y - mk * $period * tnum - cnum AS DOUBLE)
                | / (${denom}e0 * CAST(mk AS DOUBLE) * ${period}e0)""".stripMargin.replace("\n", ""))
          .as("resid"))
  }

  /** Integer decomposition parts: (key, bucket, y, phase, tnum, mk,
    * cnum) — tnum null on half-window edges, mk/cnum null for keys
    * with under one full period of trend rows. Shared by [[decompose]]
    * and [[anomaliesAdjusted]]. */
  private def decomposedParts(series: DataFrame, period: Int,
      stepSeconds: Long = 3600L): DataFrame = {
    require(period >= 2, s"graft: period >= 2 required, got $period")
    val (h, denom) = trendParams(period)
    val wk = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val withT = series
      .withColumn("s", sum(col("y")).over(wk.rowsBetween(-h, h)))
      .withColumn("ylag", lag(col("y"), h).over(wk))
      .withColumn("ylead", lead(col("y"), h).over(wk))
      .withColumn("tnum",
        when(col("ylag").isNotNull && col("ylead").isNotNull,
          if (period % 2 == 0) lit(2L) * col("s") - col("ylag") - col("ylead")
          else col("s")))
      .drop("s", "ylag", "ylead")
      .withColumn("phase",
        expr(s"pmod(unix_timestamp(bucket) DIV $stepSeconds, $period)"))

    // per-key whole-period span of trend-defined rows
    val wt = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val trendRows = withT.filter(col("tnum").isNotNull)
      .withColumn("i", row_number().over(wt) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("key"))))
      .withColumn("mk", expr(s"n DIV $period"))
    val kept = trendRows.filter(col("i") < col("mk") * period)
      .withColumn("dnum", lit(denom) * col("y") - col("tnum"))

    // phase sums + per-key total (for centering), both exact LONG
    val phaseSums = kept.groupBy(col("key"), col("phase"))
      .agg(sum(col("dnum")).as("ssum"), max(col("mk")).as("mk"))
    val keyTotals = phaseSums.groupBy(col("key"))
      .agg(sum(col("ssum")).as("tsum"))
    val seasonal = phaseSums.join(keyTotals, Seq("key"))
      .select(col("key"), col("phase"), col("mk"),
        (lit(period.toLong) * col("ssum") - col("tsum")).as("cnum"))

    // equi-join, NOT broadcast: seasonal is keys×period rows —
    // unbounded with the key count at 100 TB
    withT.join(seasonal, Seq("key", "phase"), "left_outer")
  }

  /**
   * SEASONALLY-ADJUSTED rolling z-score anomalies: the k-sigma test
   * of [[anomalies]] applied to the exact RESIDUAL numerators instead
   * of the raw counts — on a strongly daily-patterned metric the raw
   * test is blinded by the pattern's own variance (every morning peak
   * looks like three sigmas); after subtracting trend + seasonal the
   * residual variance is the noise floor and a genuine spike stands
   * out (the dbmind metric detector's seasonal mode).
   *
   * Exactness discipline: the residual numerator rnum = 2m·mk·m·y −
   * mk·m·tnum − cnum is an exact LONG over the constant per-key
   * denominator; the rolling test compares integer squares promoted
   * to DECIMAL(38,0) (rnum can reach ~5e9 at sf0.1 — its square
   * overflows LONG, and a silent non-ANSI wrap would corrupt the
   * flag). Rows need both a trend value and a seasonal estimate, so
   * flags exist for grid interiors of keys with ≥ 1 full period.
   *
   * Output: (key, bucket, y, resid, is_anom) for every interior
   * bucket with `lookback` fully-adjusted buckets strictly before it.
   */
  def anomaliesAdjusted(series: DataFrame, period: Int, lookback: Int,
      k: Int, stepSeconds: Long = 3600L): DataFrame = {
    val (_, denom) = trendParams(period)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val interior = decomposedParts(series, period, stepSeconds)
      .filter(col("tnum").isNotNull && col("cnum").isNotNull)
      .withColumn("rnum",
        expr(s"CAST($denom * mk * $period * y - mk * $period * tnum - cnum AS BIGINT)"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    val L = lit(lookback.toLong)
    val tested = interior
      .withColumn("s", sum(col("rnum")).over(w))
      .withColumn("q", sum(col("rnum").cast(d38) * col("rnum").cast(d38)).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === lookback)
    val dev = (L * col("rnum") - col("s")).cast(d38)
    tested.select(col("key"), col("bucket"), col("y"),
      expr(s"""CAST(rnum AS DOUBLE)
              | / (${denom}e0 * CAST(mk AS DOUBLE) * ${period}e0)""".stripMargin
        .replace("\n", "")).as("resid"),
      (dev * dev >
        lit(k.toLong * k).cast(d38) *
          (L.cast(d38) * col("q") - col("s").cast(d38) * col("s").cast(d38)))
        .as("is_anom"))
  }

  /**
   * Forecast `horizon` buckets past each key's grid end: OLS line over
   * the trend numerators (exact integer moments n, Σx, Σx², ΣxY) plus
   * the phase seasonal — prophet_predict's yhat = trend + seasonal
   * shape. Future bucket at step f (1-based) sits x = (N−1) + m/2 + f
   * trend-index units past the line's origin.
   *
   * NO KEY IS SILENTLY DROPPED: every key in `series` emits its
   * `horizon` future rows. The trend line needs ≥ 2 trend points
   * (n ≥ 2 ⇒ the integer x's are distinct ⇒ n·Σx²−(Σx)² > 0, never a
   * zero denominator); keys below that emit NULL forecasts. A key
   * with trend points but less than one full period of them has no
   * seasonal estimate — its seasonal coalesces to 0 and the forecast
   * is the bare trend line.
   */
  def forecast(series: DataFrame, period: Int, horizon: Int,
      stepSeconds: Long = 3600L): DataFrame = {
    val (moments, seasonal, ends) = fitFrames(series, period, stepSeconds)
    forecastFrom(moments, seasonal, ends, period, horizon, stepSeconds)
  }

  /** The three internal model relations: per-key OLS moments, per-
    * (key, phase) seasonal numerators, per-key grid ends. */
  private def fitFrames(series: DataFrame, period: Int,
      stepSeconds: Long = 3600L): (DataFrame, DataFrame, DataFrame) = {
    require(period >= 2, s"graft: period >= 2 required, got $period")
    val (h, denom) = trendParams(period)
    val wk = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val withT = series
      .withColumn("s", sum(col("y")).over(wk.rowsBetween(-h, h)))
      .withColumn("ylag", lag(col("y"), h).over(wk))
      .withColumn("ylead", lead(col("y"), h).over(wk))
      .withColumn("tnum",
        when(col("ylag").isNotNull && col("ylead").isNotNull,
          if (period % 2 == 0) lit(2L) * col("s") - col("ylag") - col("ylead")
          else col("s")))
      .withColumn("phase",
        expr(s"pmod(unix_timestamp(bucket) DIV $stepSeconds, $period)"))

    val wt = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val trendRows = withT.filter(col("tnum").isNotNull)
      .withColumn("i", (row_number().over(wt) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("key"))))
      .withColumn("mk", expr(s"n DIV $period"))

    // OLS moments over ALL trend rows; seasonal over the whole-period span
    val moments = trendRows.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("i")).as("sx"),
        sum(col("i") * col("i")).as("sxx"),
        sum(col("i") * col("tnum")).as("sxy"),
        sum(col("tnum")).as("sy"))
    val kept = trendRows.filter(col("i") < col("mk") * period)
      .withColumn("dnum", lit(denom) * col("y") - col("tnum"))
    val phaseSums = kept.groupBy(col("key"), col("phase"))
      .agg(sum(col("dnum")).as("ssum"), max(col("mk")).as("mk"))
    val keyTotals = phaseSums.groupBy(col("key")).agg(sum(col("ssum")).as("tsum"))
    val seasonal = phaseSums.join(keyTotals, Seq("key"))
      .select(col("key"), col("phase"), col("mk"),
        (lit(period.toLong) * col("ssum") - col("tsum")).as("cnum"))

    val ends = series.groupBy(col("key")).agg(max(col("bucket")).as("hi"))
    (moments, seasonal, ends)
  }

  /** Shared predict tail — ONE expression text whether the model was
    * just fit or reloaded from parquet, so fit→predict and
    * fit→save→load→predict are bit-identical. */
  private def forecastFrom(moments: DataFrame, seasonal: DataFrame,
      ends: DataFrame, period: Int, horizon: Int,
      stepSeconds: Long = 3600L): DataFrame = {
    val (h, denom) = trendParams(period)
    val future = ends
      .select(col("key"), col("hi"),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("f"))
      .select(col("key"), col("f"),
        expr(s"timestampadd(SECOND, f * $stepSeconds, hi)").as("bucket"))
      .withColumn("phase",
        expr(s"pmod(unix_timestamp(bucket) DIV $stepSeconds, $period)"))

    // LEFT joins (and equi, not broadcast — moments/seasonal grow with
    // the key count): a key short on trend history still emits rows
    future.join(moments, Seq("key"), "left_outer")
      .join(seasonal, Seq("key", "phase"), "left_outer")
      .withColumn("xf", col("n") - 1 + lit(h.toLong) + col("f"))
      .select(col("key"), col("bucket"),
        expr(s"""CASE WHEN n >= 2 THEN (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                | + CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                | * (CAST(xf AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                | / ${denom}e0 END""".stripMargin.replace("\n", "")).as("trend_part"),
        expr(s"""coalesce(CAST(cnum AS DOUBLE)
                | / (${denom}e0 * CAST(mk AS DOUBLE) * ${period}e0), 0e0)""".stripMargin
          .replace("\n", "")).as("seasonal"))
      .withColumn("forecast", col("trend_part") + col("seasonal"))
  }

  /**
   * prophet_fit's two-step surface (prophet_alg.py_in:17 writes a
   * MODEL TABLE; :68 prophet_predict reads it back and forecasts
   * `periods` forward): the fitted state as ONE flat relation —
   * a 'moments' row per key (exact LONG OLS moments + the grid end)
   * plus a 'phase' row per (key, phase) (mk, cnum numerators) — tiny
   * (keys × (period+1) rows), persistable as plain parquet, and
   * exact: no doubles are stored, so a reloaded model predicts
   * BIT-IDENTICALLY to the in-memory one.
   */
  def fit(series: DataFrame, period: Int,
      stepSeconds: Long = 3600L): DataFrame = {
    val (moments, seasonal, ends) = fitFrames(series, period, stepSeconds)
    // ends LEFT-joins moments: a key with zero trend rows still gets
    // its model row (null moments → null forecast, never dropped)
    val mom = ends.join(moments, Seq("key"), "left_outer")
      .select(col("key"), lit("moments").as("kind"),
        lit(null).cast("long").as("phase"),
        col("n"), col("sx"), col("sxx"), col("sxy"), col("sy"),
        lit(null).cast("long").as("mk"), lit(null).cast("long").as("cnum"),
        col("hi"), lit(period).as("period"), lit(stepSeconds).as("step"))
    val pha = seasonal
      .select(col("key"), lit("phase").as("kind"), col("phase"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("sx"),
        lit(null).cast("long").as("sxx"), lit(null).cast("long").as("sxy"),
        lit(null).cast("long").as("sy"),
        col("mk"), col("cnum"),
        lit(null).cast("timestamp").as("hi"), lit(period).as("period"),
        lit(stepSeconds).as("step"))
    mom.unionByName(pha)
  }

  /** prophet_predict over a [[fit]] model (fresh or parquet-reloaded):
    * horizon rows per key, identical output schema and values as
    * [[forecast]] on the original series. */
  def predict(model: DataFrame, horizon: Int): DataFrame = {
    val periods = model.select(col("period"), col("step")).distinct().collect()
    require(periods.length == 1,
      s"graft: model must carry exactly one (period, step), got ${periods.length}")
    val period = periods(0).getInt(0)
    val stepSeconds = periods(0).getLong(1)
    val moments = model.filter(col("kind") === "moments")
      .select(col("key"), col("n"), col("sx"), col("sxx"), col("sxy"), col("sy"))
    val seasonal = model.filter(col("kind") === "phase")
      .select(col("key"), col("phase"), col("mk"), col("cnum"))
    val ends = model.filter(col("kind") === "moments")
      .select(col("key"), col("hi"))
    forecastFrom(moments, seasonal, ends, period, horizon, stepSeconds)
  }

  /**
   * Rolling z-score anomaly flags: each bucket is tested against the
   * mean/variance of the `lookback` FULLY-OBSERVED buckets strictly
   * before it (trailing window, no self-inclusion — the dbmind metric
   * detector shape). The k-sigma test is evaluated in exact integers:
   * (n·x − S)² > k²·(n·Q − S²) with S = Σy, Q = Σy² over the window —
   * no sqrt, no float accumulation, so the flag is hash-exact.
   *
   * Emits only rows with a full window: (key, bucket, y, mean, is_anom).
   */
  def anomalies(series: DataFrame, lookback: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    series
      .withColumn("s", sum(col("y")).over(w))
      .withColumn("q", sum(col("y") * col("y")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === lookback)
      .select(col("key"), col("bucket"), col("y"),
        expr(s"CAST(s AS DOUBLE) / ${lookback}e0").as("mean"),
        ((lit(lookback.toLong) * col("y") - col("s")) *
          (lit(lookback.toLong) * col("y") - col("s")) >
          lit(k.toLong * k) * (lit(lookback.toLong) * col("q") - col("s") * col("s")))
          .as("is_anom"))
  }
}
