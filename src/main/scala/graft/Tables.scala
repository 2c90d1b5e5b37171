package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Parquet table loader for the driver-generated test data layout.
 *
 * The events table stores TIMESTAMP(NANOS), which Spark 4 only reads
 * under `spark.sql.legacy.parquet.nanosAsLong` (set by every graft
 * session); the long nanos are normalized back to a microsecond
 * timestamp here so downstream code sees a plain timestamp column.
 */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
