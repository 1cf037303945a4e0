package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column to a backend-agnostic node tree; custom Catalyst
  * expressions need this one hop to become user-facing Columns).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. `expression` wraps the Column's
    * node tree lazily (`ColumnNodeExpression`), which the analyzer treats
    * as opaque — fine inside DataFrame plans (the DataFrame layer converts
    * at plan build), but a function-REGISTRY builder's return value goes
    * straight into the analyzed tree, where the lazy wrapper survives to
    * codegen and dies Unevaluable. This converts through the default
    * node-to-Catalyst converter up front: API functions become
    * `UnresolvedFunction`s the analyzer then resolves like any SQL text.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function builder into an EXISTING session's registry —
    * the runtime-installation counterpart of
    * `SparkSessionExtensions.injectFunction` (which only applies at
    * session build time).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** A typed `Aggregator` as a Catalyst aggregate expression — the
    * SQL-function form of `functions.udaf(agg)`. `UserDefinedAggregator`
    * is `private[sql]`, hence the bridge; the analyzer wraps the
    * returned AggregateFunction in a Complete AggregateExpression like
    * any built-in aggregate.
    */
  def scalaAggregator[IN](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, _, _],
      inputEncoder: org.apache.spark.sql.Encoder[IN],
      name: String,
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      org.apache.spark.sql.functions.udaf(agg, inputEncoder)
        .asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[Any, Any, Any]],
      children).copy(aggregatorName = Some(name))
}
