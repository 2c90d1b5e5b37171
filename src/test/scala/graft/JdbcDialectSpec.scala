package graft

import graft.sources.{JdbcDeparse => D, JdbcSource}
import org.apache.spark.sql.functions._

/**
 * Dialect-aware deparse contracts (mysql_fdw / oracle_fdw / postgres_
 * fdw deparse rules): the SAME logical query renders per-dialect with
 * the remote engine's quoting, literal and row-limit syntax; the Derby
 * rendering round-trips against the live in-process engine (the other
 * dialects' engines aren't on this classpath — their rules are pinned
 * as strings, exactly what deparse.c unit tests pin).
 */
class JdbcDialectSpec extends SparkSpec {
  import spark.implicits._

  private def logical(d: D.Dialect): String =
    D.select(d, "cust", Seq("c_key", "c_name"),
      where = Seq(D.Cmp("c_bal", ">", 1000), D.IsNull("seg", not = true)),
      orderBy = Seq(("c_bal", false)), limit = Some(50))

  test("the same logical query deparses differently per dialect") {
    assert(logical(D.MySql) ==
      "SELECT `c_key`, `c_name` FROM `cust` WHERE `c_bal` > 1000 AND " +
        "`seg` IS NOT NULL ORDER BY `c_bal` DESC LIMIT 50")
    assert(logical(D.Oracle) ==
      "SELECT \"c_key\", \"c_name\" FROM \"cust\" WHERE \"c_bal\" > 1000 " +
        "AND \"seg\" IS NOT NULL ORDER BY \"c_bal\" DESC " +
        "FETCH FIRST 50 ROWS ONLY")
    assert(logical(D.Postgres) ==
      "SELECT \"c_key\", \"c_name\" FROM \"cust\" WHERE \"c_bal\" > 1000 " +
        "AND \"seg\" IS NOT NULL ORDER BY \"c_bal\" DESC LIMIT 50")
    assert(logical(D.Derby) ==
      "SELECT \"c_key\", \"c_name\" FROM \"cust\" WHERE \"c_bal\" > 1000 " +
        "AND \"seg\" IS NOT NULL ORDER BY \"c_bal\" DESC " +
        "FETCH FIRST 50 ROWS ONLY")
    // all four differ pairwise in at least quoting or limit syntax
    val alts = Seq(logical(D.MySql), logical(D.Oracle), logical(D.Postgres))
    assert(alts.distinct.size == 3)
  }

  test("identifier, relation and literal escaping per dialect") {
    assert(D.MySql.quoteIdent("we`ird") == "`we``ird`")
    assert(D.Oracle.quoteIdent("we\"ird") == "\"we\"\"ird\"")
    assert(D.MySql.quoteTable("shop.cust") == "`shop`.`cust`")
    assert(D.Postgres.literal("O'Brien") == "'O''Brien'")
    assert(D.Postgres.literal(null) == "NULL")
    assert(D.MySql.literal(3.5) == "3.5")
    intercept[IllegalArgumentException](D.Cmp("c", "LIKE", "x"))
    intercept[IllegalArgumentException](
      D.select(D.MySql, "t", Seq.empty))
  }

  test("forUrl resolves dialects like the FDW server options") {
    assert(D.forUrl("jdbc:mysql://h/db") == D.MySql)
    assert(D.forUrl("jdbc:mariadb://h/db") == D.MySql)
    assert(D.forUrl("jdbc:oracle:thin:@h:1521:x") == D.Oracle)
    assert(D.forUrl("jdbc:postgresql://h/db") == D.Postgres)
    assert(D.forUrl("jdbc:derby:/tmp/x") == D.Derby)
    intercept[IllegalArgumentException](D.forUrl("jdbc:sqlite:x"))
  }

  test("the Derby deparse round-trips against the live engine") {
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-jdbc-dialect-${ProcessHandle.current().pid()}")
    root.mkdirs()
    System.setProperty("derby.stream.error.file",
      new java.io.File(root, "derby.log").getPath)
    val url = s"jdbc:derby:${root.getPath}/db;create=true"
    // a mixed-case column that REQUIRES quoting and a value that
    // REQUIRES literal escaping
    val df = Seq((1L, "O'Brien", 10.0), (2L, "Smith", 20.0),
      (3L, "O'Brien", 30.0), (4L, "Chan", 5.0))
      .toDF("id", "Nm", "bal")
    JdbcSource.writeTable(df, url, "DIALECT_T", Some("Nm VARCHAR(32)"))
    val got = JdbcSource.readDeparsed(spark, url, "DIALECT_T",
      Seq("id", "Nm", "bal"),
      where = Seq(D.Cmp("Nm", "=", "O'Brien"), D.Cmp("bal", ">", 5)),
      orderBy = Seq(("bal", false)), limit = Some(1))
    val rows = got.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 3L && rows(0).getString(1) == "O'Brien")
    // the deparsed text itself is the Derby dialect's
    assert(D.select(D.forUrl(url), "DIALECT_T", Seq("id"),
      limit = Some(1)) ==
      "SELECT \"id\" FROM \"DIALECT_T\" FETCH FIRST 1 ROWS ONLY")
  }
}
