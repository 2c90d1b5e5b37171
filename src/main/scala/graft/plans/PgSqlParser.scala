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
 */
class PgSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(PgSqlRewrite.rewrite(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(PgSqlRewrite.rewrite(sqlText), ctx)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(PgSqlRewrite.rewrite(sqlText))

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
