package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Federated JDBC external tables — the reference's most-used FDW
 * family (contrib/postgres_fdw/postgres_fdw.cpp: remote tables with
 * WHERE-clause and column pushdown; contrib/dblink/dblink.cpp:
 * arbitrary remote SQL). Re-expressed on Spark's JDBC source, which
 * already implements the FDW contract natively:
 *
 *  - **Predicate pushdown**: Catalyst filters compile to the remote
 *    WHERE clause (`PushedFilters` on the JDBC scan — plan-asserted
 *    in JdbcSourceSpec), so a selective probe never ships the remote
 *    table.
 *  - **Column pruning**: only referenced columns appear in the remote
 *    SELECT list (postgres_fdw's deparsed target list).
 *  - **Parallel partitioned reads**: `readPartitioned` splits the
 *    remote scan into `numPartitions` range-bounded queries — the
 *    scale path for a large remote table (each executor opens its own
 *    connection and reads one stride; a single-connection read would
 *    bottleneck 1000 executors on one socket).
 *
 * `readQuery` is dblink: push an arbitrary SQL text to the remote
 * engine and expose the result as a DataFrame (Spark's `query`
 * option wraps it as a derived table, so pushed filters still compose
 * on top of it).
 *
 * The gate runs against an in-process Apache Derby database (the one
 * JDBC engine on this classpath); the API carries no Derby-isms — a
 * postgres/mysql URL + driver swaps in unchanged.
 */
object JdbcSource {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Remote table as a DataFrame (single-connection read — use
    * [[readPartitioned]] for anything big). */
  def readTable(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Remote table split into `numPartitions` parallel range reads on
    * an integral `partitionCol` spanning [lower, upper]. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props(options))

  /** dblink: run `sql` on the remote engine, expose the result set.
    * Spark wraps it as a derived table, so further filters still push
    * into the remote plan around it. */
  def readQuery(spark: SparkSession, url: String, sql: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .options(options)
      .load()

  /** Heterogeneous-FDW read: AUTHOR the remote SQL in the remote
    * engine's dialect (quoting / literals / row-limit — see
    * [[JdbcDeparse]]) and ship it whole, so WHERE/ORDER/LIMIT execute
    * remotely. The dblink path with mysql_fdw/oracle_fdw deparse
    * rules. */
  def readDeparsed(spark: SparkSession, url: String, table: String,
      cols: Seq[String], where: Seq[JdbcDeparse.Pred] = Seq.empty,
      orderBy: Seq[(String, Boolean)] = Seq.empty,
      limit: Option[Long] = None,
      options: Map[String, String] = Map.empty): DataFrame =
    readQuery(spark, url, JdbcDeparse.select(JdbcDeparse.forUrl(url),
      table, cols, where, orderBy, limit), options)

  /** Materialize a DataFrame as a remote table (the writeback half of
    * an FDW round-trip). `columnTypes` overrides the dialect's
    * default DDL types (e.g. Derby maps StringType to CLOB, which
    * cannot anchor remote predicates — pass `"name VARCHAR(64)"`). */
  def writeTable(df: DataFrame, url: String, table: String,
      columnTypes: Option[String] = None,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode("overwrite")
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.options(options).jdbc(url, table, props(options))
  }
}
