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

  /** Release the JVM-wide streaming state-store cache (providers keep
    * loaded state versions in executor memory after a query stops; for
    * an AvailableNow drain-style use that memory is dead weight once the
    * drain completes). Providers reload lazily from the checkpoint on
    * the next streaming query, so this is safe between queries. */
  def releaseStreamingState(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
