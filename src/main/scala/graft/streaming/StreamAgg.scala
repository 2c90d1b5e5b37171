package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed event aggregation (SURVEY §2 E1). The same plan runs batch or
 * streaming: `withWatermark` is a no-op on batch frames, so the batch
 * entry in SparkEntry and the readStream pipeline in StreamingSpec share
 * this code path — the batch result IS the oracle for the stream.
 */
object StreamAgg {

  /**
   * Event-time-bounded self-join: for each `leftType` event, the
   * `rightType` events of the same user within `withinMinutes` after it.
   * The time-range condition makes this a valid watermarked
   * stream-stream join (state bounded by the watermark delay); on batch
   * frames it is a plain range join.
   */
  def eventJoin(left: DataFrame, right: DataFrame, leftType: String,
      rightType: String, withinMinutes: Int): DataFrame = {
    val l = left.filter(col("event_type") === leftType)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"),
        col("event_id").as("l_event"), col("value").as("l_value"))
      .withWatermark("l_ts", s"$withinMinutes minutes")
    val r = right.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event"), col("value").as("r_value"))
      .withWatermark("r_ts", s"$withinMinutes minutes")
    l.join(r,
      col("l_user") === col("r_user")
        && col("r_ts") > col("l_ts")
        && col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
  }

  /**
   * Stream-static enrichment + windowed rollup (SURVEY §2 E4): the
   * fact stream joins a STATIC dimension — Spark plans a broadcast
   * hash join with NO join state (only the aggregation keeps state,
   * bounded by the watermark), which is the right 100 TB shape: the
   * dim ships once per executor, the stream never shuffles for the
   * join. Same plan runs batch (watermark is a no-op) — the batch
   * result is the stream's oracle.
   */
  def enrichedWindowedAgg(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String, dimGroup: String,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(dimKey), col(dimGroup))),
        col(eventKey) === col(dimKey))
      .groupBy(window(col("ts"), windowDur), col(dimGroup))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
      .select(col("window.start").as("window_start"), col(dimGroup),
        col("n"), col("total"))

  /**
   * Tumbling-window counts/sums per event type. Streaming-safe:
   * watermarked event time, exact DECIMAL value sums.
   */
  def windowedAgg(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /**
   * HOPPING (sliding) windowed aggregation — `window(ts, size, slide)`
   * with slide < size, so each event contributes to size/slide
   * overlapping windows (the trend-smoothing form: a 10-minute rate
   * refreshed every 5). Same watermark-bounded state story as
   * [[windowedAgg]] — state per OPEN window is size/slide × the
   * tumbling case, still bounded by the watermark horizon; identical
   * plan runs batch (the gate) and under readStream (stream==batch in
   * StreamingSpec). Integer aggregates only, window key as epoch
   * seconds — dtype-proof and order-free.
   */
  def hoppingAgg(events: DataFrame, windowDur: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
        min(col("event_id")).as("first_id"))
      .select(col("window.start").cast("long").as("ws_epoch"),
        col("n"), col("id_sum"), col("first_id"))
}
