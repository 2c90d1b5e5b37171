package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * pg_stat_statements-shaped workload statistics (reference:
 * contrib/pg_stat_statements/pg_stat_statements.cpp — query texts
 * normalize by replacing constants, then execution stats aggregate per
 * normalized fingerprint: calls, total/min/max/mean time, rows).
 *
 * The reference hooks the executor and keeps a shared-memory hash; the
 * warehouse form is a batch pass over a query log table (the shape
 * log_fdw / LogSource already reads). Normalization is a pure codegen
 * regexp chain (map-only over 100 TB of logs), aggregation is ONE
 * map-side-combined groupBy on the fingerprint — the collapsed key
 * space (templates, not texts) makes the shuffle tiny by construction.
 *
 * Exactness discipline: times aggregate as exact LONG micros (sum,
 * sumsq, min, max are order-free); mean/stddev derive from those
 * moments via formula text shared verbatim with any SQL oracle (sqrt
 * is IEEE-exact).
 */
object QueryStats {

  // shared with the DuckDB oracle verbatim — RE2-safe, no lookaround.
  // Strings first (so digits inside quotes vanish with the literal),
  // then bare numbers; \b keeps digits inside identifiers (t3, col2).
  val StringLitRx = "'[^']*'"
  val NumberRx = "\\b[0-9]+(\\.[0-9]+)?\\b"
  val WsRx = "\\s+"

  /** Replace constants with '?' and collapse whitespace — the
    * reference's fingerprint text. */
  def normalize(q: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      q, StringLitRx, "?"), NumberRx, "?"), WsRx, " "))

  /** mean/stddev from the exact moments — SQL text shared with the
    * oracle so the IEEE trees match bit-for-bit. */
  val derivedExprs: Seq[(String, String)] = Seq(
    "mean_time_us" ->
      "(CAST(total_time_us AS DOUBLE) / CAST(calls AS DOUBLE))",
    "stddev_time_us" ->
      ("sqrt((CAST(sumsq_time AS DOUBLE) - CAST(total_time_us AS DOUBLE)" +
        " * CAST(total_time_us AS DOUBLE) / CAST(calls AS DOUBLE))" +
        " / CAST(calls AS DOUBLE))"))

  /**
   * The pg_stat_statements view over a query log: one row per
   * normalized query, keyed by `queryid` = md5(normalized text)
   * (cross-engine, unlike the reference's internal jumble hash).
   * `timeUs` must be an integral-micros column; `rows` the per-call
   * row count.
   */
  def statStatements(log: DataFrame, query: Column, timeUs: Column,
      rows: Column): DataFrame =
    log.select(normalize(query).as("query_norm"),
        timeUs.cast("long").as("t"), rows.cast("long").as("r"))
      .groupBy(col("query_norm"))
      .agg(
        count(lit(1)).as("calls"),
        sum(col("t")).as("total_time_us"),
        min(col("t")).as("min_time_us"),
        max(col("t")).as("max_time_us"),
        sum(col("t") * col("t")).as("sumsq_time"),
        sum(col("r")).as("rows_returned"))
      .withColumn("queryid", md5(col("query_norm")))
      .selectExpr(Seq("queryid", "query_norm", "calls", "total_time_us",
        "min_time_us", "max_time_us", "sumsq_time", "rows_returned") ++
        derivedExprs.map { case (nm, x) => s"$x AS $nm" }: _*)
}
