package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range => LRange}
import org.apache.spark.sql.types.Decimal

/**
 * SET-RETURNING SQL functions (table functions) — the FROM-clause
 * surface PG users lean on: `generate_series` (PG core; INCLUSIVE
 * bounds, signed step) and `normal_rand` (contrib/tablefunc
 * tablefunc.cpp:137, the deterministic seeded form C90 gated as a
 * driver API — now callable as `FROM normal_rand(n, mean, stddev,
 * seed)`).
 *
 * Builders return LOGICAL PLANS: generate_series compiles straight to
 * Catalyst's Range node (the same distributed, splittable source
 * spark.range plans — no materialized list, so
 * `generate_series(1, 10_000_000_000)` is a parallel scan, not a
 * driver array); normal_rand reuses the C90 kernel over Range.
 * Arguments must be literals, as PG's planner effectively requires
 * for FROM-clause SRFs that size a scan.
 */
object SqlTableFunctions {

  private def litLong(e: Expression, fn: String, what: String): Long =
    e match {
      case Literal(v: Number, _) => v.longValue
      case Literal(d: Decimal, _) => d.toLong
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be an integer literal, got $other")
    }

  private def litDouble(e: Expression, fn: String, what: String): Double =
    e match {
      case Literal(d: Decimal, _) => d.toDouble
      case Literal(v: Number, _) => v.doubleValue
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be a numeric literal, got $other")
    }

  val all: Map[String, Seq[Expression] => LogicalPlan] = Map(
    "generate_series" -> (args => {
      require(args.length == 2 || args.length == 3,
        "graft: generate_series expects (start, stop[, step])")
      val start = litLong(args(0), "generate_series", "start")
      val stop = litLong(args(1), "generate_series", "stop")
      val step = if (args.length == 3)
        litLong(args(2), "generate_series", "step") else 1L
      // PG: ERROR: step size cannot equal zero
      require(step != 0, "graft: generate_series step size cannot equal zero")
      // PG bounds are INCLUSIVE; Range's end is exclusive
      val end = if (step > 0) stop + 1 else stop - 1
      val range = LRange(start, end, step, None)
      Project(Seq(Alias(range.output.head, "generate_series")()), range)
    }),
    "normal_rand" -> (args => {
      require(args.length == 3 || args.length == 4,
        "graft: normal_rand expects (n, mean, stddev[, seed])")
      val n = litLong(args(0), "normal_rand", "n")
      val mean = litDouble(args(1), "normal_rand", "mean")
      val stddev = litDouble(args(2), "normal_rand", "stddev")
      val seed = if (args.length == 4)
        litLong(args(3), "normal_rand", "seed") else 0L
      org.apache.spark.sql.graft.Bridge.logicalPlan(
        graft.operators.TableFunc.normalRand(SparkSession.active, n, mean,
          stddev, seed))
    }),
    // contrib/dblink (dblink.c dblink_record_internal): run a query on
    // a remote database and expose the result set in the FROM clause.
    // PG needs an AS (col type, ...) clause because dblink returns
    // anonymous records; the JDBC path infers the schema from the
    // remote prepared statement, so the AS clause is unnecessary.
    // Spark wraps the shipped query as a derived table — outer
    // filters/limits still push into the remote scan around it.
    "dblink" -> (args => {
      require(args.length == 2,
        "graft: dblink expects (connstr, query) string literals")
      val url = litString(args(0), "dblink", "connstr")
      val remoteSql = litString(args(1), "dblink", "query")
      org.apache.spark.sql.graft.Bridge.logicalPlan(
        graft.sources.JdbcSource.readQuery(SparkSession.active, url,
          remoteSql))
    }),
    // tsearch introspection SRFs, exactly the regress spelling
    // (`SELECT * FROM ts_parse('default', '...')`, ts_token_type,
    // ts_debug) — literal text, constant-sized local relations. The
    // SCALAR ts_parse/ts_token_type (SqlTextSearch) handle column
    // input; the two registries coexist like PG's.
    "ts_parse" -> (args => {
      requireParser(litString(args(0), "ts_parse", "parser"), "ts_parse")
      val text = litString(args(1), "ts_parse", "text")
      val spark = SparkSession.active
      import spark.implicits._
      org.apache.spark.sql.graft.Bridge.logicalPlan(
        TsDefaultParser.parse(text).toDF("tokid", "token"))
    }),
    "ts_token_type" -> (args => {
      requireParser(
        litString(args(0), "ts_token_type", "parser"), "ts_token_type")
      val spark = SparkSession.active
      import spark.implicits._
      org.apache.spark.sql.graft.Bridge.logicalPlan(
        TsDefaultParser.tokenTypes.toDF("tokid", "alias", "description"))
    }),
    "ts_debug" -> (args => {
      val a = if (args.length == 2) {
        val cfg = litString(args(0), "ts_debug", "config")
          .toLowerCase(java.util.Locale.ROOT)
        require(Set("english", "default", "pg_catalog.english").contains(cfg),
          s"graft: ts_debug: unsupported text search configuration '$cfg'")
        args.tail
      } else args
      val text = litString(a.head, "ts_debug", "text")
      val spark = SparkSession.active
      import spark.implicits._
      org.apache.spark.sql.graft.Bridge.logicalPlan(
        graft.operators.FullText.tsDebug(text)
          .toDF("alias", "description", "token", "dictionary", "lexemes"))
    })
  )

  private def litString(e: Expression, fn: String, what: String): String =
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
          if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be a string literal, got $other")
    }

  private def requireParser(p: String, fn: String): Unit = {
    val n = p.toLowerCase(java.util.Locale.ROOT)
    require(n == "default" || n == "3722",
      s"graft: $fn: unknown parser '$n' (only 'default')")
  }
}
