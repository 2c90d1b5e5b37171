package graft

import graft.sources.JdbcSource
import org.apache.spark.sql.functions._

/**
 * Federated JDBC source (postgres_fdw/dblink analogue) against an
 * in-process Derby engine: the FDW contract — predicate pushdown,
 * column pruning, parallel range partitioning, remote-SQL (dblink)
 * derived tables — asserted on the actual executed plans.
 */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-jdbc-spec-${ProcessHandle.current().pid()}")
    root.mkdirs() // derby.log's parent must exist before Derby boots
    System.setProperty("derby.stream.error.file",
      new java.io.File(root, "derby.log").getPath)
    val u = s"jdbc:derby:${root.getPath}/db;create=true"
    val df = spark.range(1, 1001).select(col("id").as("k"),
      (col("id") % 7).as("grp"),
      concat(lit("name_"), col("id")).as("nm"))
    JdbcSource.writeTable(df, u, "T", Some("nm VARCHAR(32)"))
    u
  }

  test("filters push to the remote engine and columns prune") {
    val q = JdbcSource.readTable(spark, url, "T")
      .filter(col("k") > 900).select(col("k"), col("grp"))
    val p = q.queryExecution.executedPlan.toString
    // the WHERE deparses into the remote query (postgres_fdw's
    // deparsed restriction clause)
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(k,900"),
      s"filter not pushed to the JDBC relation:\n$p")
    // only the referenced columns appear in the remote SELECT list
    assert(!p.contains("nm"), "unreferenced remote column not pruned")
    assert(q.count() == 100)
  }

  test("partitioned read splits the remote scan into parallel ranges") {
    val q = JdbcSource.readPartitioned(spark, url, "T", "k", 1, 1000, 4)
    assert(q.rdd.getNumPartitions == 4)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("numPartitions=4"), s"partitioned scan missing:\n$p")
    // every row lands exactly once across the range strides
    assert(q.count() == 1000)
    assert(q.agg(sum(col("k"))).head().getLong(0) == 500500L)
  }

  test("dblink-style remote SQL runs on the remote engine") {
    val q = JdbcSource.readQuery(spark, url,
      """SELECT "grp", COUNT(*) AS n, SUM("k") AS s FROM T GROUP BY "grp"""")
    val got = q.orderBy(col("grp")).as[(Long, Long, Long)].collect().toSeq
    val want = spark.range(1, 1001)
      .groupBy((col("id") % 7).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .orderBy(col("grp")).as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    // further filters compose around the derived table
    assert(q.filter(col("n") > 0).count() == 7)
  }

  test("round-trip writeback is lossless including doubles") {
    val df = spark.range(1, 101).select(col("id").as("k"),
      (col("id").cast("double") / 3.0).as("v"))
    JdbcSource.writeTable(df, url, "RT")
    val back = JdbcSource.readTable(spark, url, "RT")
    assert(back.count() == 100)
    val diff = back.join(df, "k")
      .filter(back("v") =!= df("v")).count()
    assert(diff == 0, "double round-trip through JDBC lost precision")
  }
}
