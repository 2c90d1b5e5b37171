package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("vec_l2_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.VectorSuite.queries ++
      graft.queries.RelationalSuite.queries ++
      graft.queries.RelationalSuite2.queries ++
      graft.queries.RelationalSuite3.queries ++
      graft.queries.RelationalSuite4.queries ++
      graft.queries.RelationalSuite5.queries ++
      graft.queries.MlSuite.queries ++
      graft.queries.SeasonalSuite.queries ++
      graft.queries.AnnSuite.queries ++
      graft.queries.TextSuite.queries ++
      graft.queries.DedupSuite.queries ++
      graft.queries.SqlStatementSuite.queries ++
      graft.queries.StreamingSuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.VectorSuite.oracle ++
      graft.queries.RelationalSuite.oracle ++
      graft.queries.RelationalSuite2.oracle ++
      graft.queries.RelationalSuite3.oracle ++
      graft.queries.RelationalSuite4.oracle ++
      graft.queries.RelationalSuite5.oracle ++
      graft.queries.MlSuite.oracle ++
      graft.queries.SeasonalSuite.oracle ++
      graft.queries.AnnSuite.oracle ++
      graft.queries.TextSuite.oracle ++
      graft.queries.DedupSuite.oracle ++
      graft.queries.SqlStatementSuite.oracle ++
      graft.queries.StreamingSuite.oracle
}
