package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Expression <-> Column bridge. Spark 4's `Column` wraps a ColumnNode and
 * the converters live in `private[sql] ExpressionUtils`, so third-party
 * Catalyst expressions need this one-file shim inside the sql package
 * namespace (the conventional pattern for Spark extension libraries).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame from a LogicalPlan (classic Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** What a SparkSessionExtensions instance would inject (for specs). */
  def injectedRulesAndStrategies(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession)
      : (Seq[org.apache.spark.sql.catalyst.rules.Rule[
           org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]],
         Seq[org.apache.spark.sql.execution.SparkStrategy]) =
    (ext.buildOptimizerRules(spark), ext.buildPlannerStrategies(spark))

  /** Register a named SQL function backed by a Catalyst expression builder. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
}
