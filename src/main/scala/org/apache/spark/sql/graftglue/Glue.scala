package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column.expr` private: the
  * public Column API is backed by ColumnNodes, and the converters live
  * in `org.apache.spark.sql.classic.ExpressionUtils` marked
  * private[sql]. Custom native expressions (graft.expressions.*) need
  * exactly that conversion, so this object sits inside the
  * org.apache.spark.sql package namespace to re-export the two calls —
  * the established pattern for Spark extension libraries.
  */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (post-hoc path —
    * SparkSessionExtensions only bind at session build, but the engine
    * often receives an already-built session from its host).
    * `sessionState` is private[sql], hence this lives in the bridge.
    */
  def registerFunction(spark: org.apache.spark.sql.classic.SparkSession,
                       name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** DataFrame from a hand-built LogicalPlan (custom operators build
    * their plan nodes directly; `Dataset.ofRows` is private[sql]).
    */
  def ofRows(spark: org.apache.spark.sql.classic.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes for
    * custom-plan construction).
    */
  def analyzed(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.analyzed
}
