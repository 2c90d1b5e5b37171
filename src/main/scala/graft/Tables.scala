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
 *
 * The local test files are single-row-group parquet, so every scan is
 * one task no matter how small maxPartitionBytes is set (a parquet
 * split below row-group granularity reads zero row groups). A
 * production corpus is thousands of files/row-groups and scans with
 * full parallelism; simulate that here by spreading the larger tables
 * across the session's default parallelism. Filters and column pruning
 * still reach the scan — Catalyst pushes both through Repartition —
 * and the small dimension tables stay unspread so broadcast plans are
 * unchanged.
 */
object Tables {
  /**
   * Tables at/below this on-disk size skip the spread: the extra
   * shuffle stage costs a fixed ~0.1-0.3s locally, which the tiny
   * dimension tables can't amortize — and they must stay
   * broadcast-shaped anyway. Everything bigger (fact tables, the text
   * corpus, embeddings) wins: their scan-side kernels are the CPU cost.
   */
  private val SpreadBytes = 256 * 1024L

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df0 = spark.read.parquet(path)
    val df =
      if (name == "events" && df0.schema("ts").dataType == LongType)
        df0.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df0
    val par = spark.sparkContext.defaultParallelism
    if (new java.io.File(path).length > SpreadBytes &&
        df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }
}
