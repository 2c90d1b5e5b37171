package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/**
 * Gap-fill contracts: the dense grid spans exactly each key's
 * [first, last] bucket, LOCF carries the previous OBSERVED value
 * (never a filled one), and leading buckets are observed by
 * construction (the grid starts at an observation).
 */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillLocf on a hand-built series") {
    // key 1: observations at minutes 0, 3 (values 10, 30) → grid 0..3
    // key 2: single observation → single-row grid
    val rows = Seq(
      (1L, "2024-01-01 00:00:10", 10.0),
      (1L, "2024-01-01 00:00:40", 7.0),   // same bucket as above → max=10
      (1L, "2024-01-01 00:03:05", 30.0),
      (2L, "2024-01-01 05:00:00", 99.0))
    val df = rows.toDF("k", "t", "v")
      .select(col("k"), to_timestamp(col("t")).as("ts"), col("v"))
    val got = TimeSeries.gapFillLocf(df, "k", "ts", "v")
      .orderBy("key", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    val want = Seq(
      (1L, "2024-01-01 00:00:00.0", 10.0, true),
      (1L, "2024-01-01 00:01:00.0", 10.0, false),
      (1L, "2024-01-01 00:02:00.0", 10.0, false),
      (1L, "2024-01-01 00:03:00.0", 30.0, true),
      (2L, "2024-01-01 05:00:00.0", 99.0, true))
    assert(got.toSeq == want)
  }

  test("grid bounds and LOCF invariants on events") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(SparkTestSession.normTs)
    val filled = TimeSeries.gapFillLocf(ev, "user_id", "ts", "value",
      truncUnit = "hour", step = "1 hour").cache()
    try {
      // no nulls anywhere: the first grid row per key is an observation
      assert(filled.filter(col("v").isNull).isEmpty)
      // per key: first and last rows observed, count = span hours + 1
      val byKey = filled.groupBy("key").agg(
        count(lit(1)).as("n"),
        min("bucket").as("lo"), max("bucket").as("hi"),
        min(when(col("observed"), col("bucket"))).as("firstObs"))
        .withColumn("span",
          (unix_timestamp(col("hi")) - unix_timestamp(col("lo"))) / 3600 + 1)
      assert(byKey.filter(col("n") =!= col("span")).isEmpty,
        "grid must be dense: one row per hour in [lo, hi]")
      assert(byKey.filter(col("firstObs") =!= col("lo")).isEmpty,
        "grid must start at the key's first observation")
    } finally filled.unpersist()
  }
}
