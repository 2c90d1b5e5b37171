package graft

import graft.operators.QueryStats
import org.apache.spark.sql.functions._

/**
 * pg_stat_statements contracts: constant stripping matches the
 * reference's fingerprint behavior (literals vanish, identifiers
 * survive), and per-template stats aggregate exactly.
 */
class QueryStatsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(q: String): String =
    Seq(q).toDF("q").select(QueryStats.normalize(col("q")).as("n"))
      .collect()(0).getString(0)

  test("normalize: literals → ?, identifiers with digits survive") {
    assert(norm("SELECT * FROM t3 WHERE k = 42") ===
      "SELECT * FROM t3 WHERE k = ?")
    assert(norm("SELECT a FROM x WHERE s = 'abc 123 def'") ===
      "SELECT a FROM x WHERE s = ?")
    assert(norm("INSERT INTO col2 VALUES (1, 2.5, 'x')") ===
      "INSERT INTO col2 VALUES (?, ?, ?)")
    assert(norm("SELECT   1\t+\n2") === "SELECT ? + ?")
    // two texts differing only in constants share one fingerprint
    assert(norm("UPDATE t SET v = 7 WHERE tag = 'a'") ===
      norm("UPDATE t SET v = 99 WHERE tag = 'zzz'"))
  }

  test("statStatements aggregates exact per-template moments") {
    val log = Seq(
      ("SELECT * FROM t WHERE k = 1", 100L, 1L),
      ("SELECT * FROM t WHERE k = 2", 300L, 3L),
      ("DELETE FROM u WHERE k = 9", 50L, 0L)
    ).toDF("q", "t", "r")
    val out = QueryStats.statStatements(log, col("q"), col("t"), col("r"))
      .collect().map(r => r.getAs[String]("query_norm") ->
        (r.getAs[Long]("calls"), r.getAs[Long]("total_time_us"),
          r.getAs[Long]("min_time_us"), r.getAs[Long]("max_time_us"),
          r.getAs[Long]("sumsq_time"), r.getAs[Long]("rows_returned"),
          r.getAs[Double]("mean_time_us"))).toMap
    assert(out("SELECT * FROM t WHERE k = ?") ===
      ((2L, 400L, 100L, 300L, 100000L, 4L, 200.0)))
    assert(out("DELETE FROM u WHERE k = ?") ===
      ((1L, 50L, 50L, 50L, 2500L, 0L, 50.0)))
  }

  test("aggregation is map-side combinable (partial HashAggregate, no Window)") {
    val log = spark.range(0, 1000, 1, 8).toDF("i")
      .select(concat(lit("SELECT "), col("i")).as("q"),
        col("i").as("t"), col("i").as("r"))
    val p = QueryStats.statStatements(log, col("q"), col("t"), col("r"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }
}
