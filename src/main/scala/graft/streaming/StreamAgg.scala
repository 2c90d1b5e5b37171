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
}
