package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` surface, the standard pattern for
 * third-party Spark extension libraries (spatial/ML libs all ship such a
 * shim): lift a Catalyst Expression into the public Column API and reach
 * the session FunctionRegistry on Spark 4.x (where Column is
 * ColumnNode-backed and no longer wraps Expression directly).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
