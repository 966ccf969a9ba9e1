package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Scala-visibility bridge: `classic.ExpressionUtils` is `private[sql]`,
  * so extension libraries that build `Column`s from custom Catalyst
  * `Expression`s (graft.plans.*) need this one-hop accessor compiled
  * into the sql package — the standard pattern for Spark extension
  * libraries that add native expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The three building blocks of an explicit Bloom semi-join reduction
    * (graft.ops.Bloom). Spark owns first-class implementations of the
    * bloom aggregate and probe ([[catalyst.expressions.aggregate
    * .BloomFilterAggregate]] / [[catalyst.expressions
    * .BloomFilterMightContain]]) but only the optimizer's
    * InjectRuntimeFilter rule can reach them — `might_contain` is not in
    * the public FunctionRegistry, and its type check requires the bloom
    * side to be a constant or scalar subquery. These one-hop
    * constructors let the library compose the same expressions
    * deliberately, where the join shape (not a cost heuristic) says a
    * semi-join reduction is wanted. */
  def bloomFilterAgg(child: Column, expectedItems: Long): Column =
    column(new catalyst.expressions.aggregate.BloomFilterAggregate(
      expression(child), expectedItems).toAggregateExpression())

  /** Wrap a one-row DataFrame as a scalar subquery expression — the form
    * [[catalyst.expressions.BloomFilterMightContain]] accepts for its
    * bloom side (the same shape InjectRuntimeFilter emits). */
  def scalarSubquery(df: DataFrame): Column =
    column(catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed))

  def bloomMightContain(bloom: Column, value: Column): Column =
    column(catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  /** Release the JVM-wide streaming state-store cache (providers keep
    * loaded state versions in executor memory after a query stops; for
    * an AvailableNow drain-style use that memory is dead weight once the
    * drain completes). Providers reload lazily from the checkpoint on
    * the next streaming query, so this is safe between queries. */
  def releaseStreamingState(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
