package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Delegating parser that gives `spark.sql(...)` the PG OPERATOR
 * spellings (see [[PgSqlRewrite]]): query/expression text is
 * rewritten (plan-time string work), then handed to Spark's own
 * parser — injected by [[graft.GraftExtensions]] via injectParser,
 * the same packaging Spark's docs use for syntax extensions.
 * Identifier/type parsing passes through untouched.
 *
 * STATEMENT routing (r17): after the operator rewrite, whole-plan
 * parsing additionally (1) splices `PREDICT BY model (FEATURES ...)`
 * into stored-weight literals and (2) routes the openGauss statement
 * forms Spark's grammar lacks — WITH RECURSIVE (distinct-union),
 * MERGE INTO a temp view, START WITH / CONNECT BY, TIMECAPSULE,
 * CREATE/DROP MODEL — onto the library's engines via
 * [[PgStatements]]. Anything unrouted delegates unchanged. Statement
 * routing is NOT applied to nested-query parsing (parseQuery), where
 * only expression-level rewrites are legal.
 */
class PgSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def plan(sqlText: String)(fallback: String => LogicalPlan): LogicalPlan = {
    val spliced = PgStatements.spliceSequences(
      PgStatements.splicePredict(PgSqlRewrite.rewrite(sqlText)))
    PgStatements.route(spliced).getOrElse(fallback(spliced))
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    plan(sqlText)(delegate.parsePlan)

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    plan(sqlText)(delegate.parsePlanWithParameters(_, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(
      PgStatements.splicePredict(PgSqlRewrite.rewrite(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(PgSqlRewrite.rewrite(sqlText))

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
