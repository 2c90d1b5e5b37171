package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization — gap filling + last-observation-carried-
 * forward (the PG idiom `generate_series` LEFT JOIN observations +
 * `last_value IGNORE NULLS`; openGauss inherits both).
 *
 * Scale shape: the dense grid is generated per KEY with
 * `sequence(min_bucket, max_bucket)` + explode — grid size is bounded
 * by the key's own time span, never a driver-side series or a cross
 * join against a global calendar; the observed aggregate and the LOCF
 * window both key on (key), so the whole operator is one shuffle on
 * the key plus one per-key ordered window (external sort, spillable).
 * A key with a year of minutes emits ~526k rows — bounded, and
 * independent of every other key (no skew coupling).
 *
 * Determinism: the per-bucket observed value is an order-free
 * aggregate (max), buckets are exact timestamp truncations, and LOCF
 * reads the previous OBSERVED bucket — a pure function of the input
 * set, so the gate is hash-exact.
 */
object TimeSeries {

  /**
   * Fill every `step` bucket between each key's first and last
   * observation. Output: (key, bucket, v, observed) where v is the
   * bucket's max(valueCol) when observed, else the most recent
   * observed bucket's value (LOCF).
   *
   * @param step a Spark calendar-interval literal, e.g. "1 minute"
   */
  def gapFillLocf(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, truncUnit: String = "minute",
      step: String = "1 minute"): DataFrame = {
    val observed = df
      .select(col(keyCol).as("key"),
        date_trunc(truncUnit, col(tsCol)).as("bucket"),
        col(valueCol).as("v"))
      .groupBy(col("key"), col("bucket")).agg(max(col("v")).as("v_obs"))
    val grid = observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(
        sequence(col("lo"), col("hi"), expr(s"INTERVAL $step"))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("key", "bucket"), "left_outer")
      .select(col("key"), col("bucket"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v"),
        col("v_obs").isNotNull.as("observed"))
  }
}
