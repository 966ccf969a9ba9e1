package org.apache.spark.sql

/** Stats-resetting local checkpoint for iterative algorithms.
  *
  * `Dataset.localCheckpoint` deliberately carries the ORIGINAL plan's
  * statistics into the resulting `LogicalRDD` (`originStats`), so that
  * one checkpoint doesn't flip downstream broadcast decisions. For an
  * ITERATIVE algorithm that checkpoints every round, that courtesy is
  * fatal: round k's size estimate is a product over round k−1's
  * checkpointed estimates, so `sizeInBytes` COMPOUNDS — measured on the
  * q64 connected-components loop, the BigInt triples its bit-length
  * every round (22 → 65 → 193 → … → 3.8M bits by round 12) and the
  * driver ends up spending whole minutes in BigInteger multiplies
  * inside `SizeInBytesOnlyStatsPlanVisitor` while the actual data work
  * is milliseconds.
  *
  * This shim checkpoints eagerly, then rewraps the SAME materialized
  * `InternalRow` RDD in a fresh `LogicalRDD` with no origin stats
  * (`internalCreateDataFrame`, zero row conversion) — the estimate
  * resets to the session default each round instead of compounding.
  * Callers that relied on stats for join planning must pass explicit
  * `broadcast()` hints, which the iterative callers do (they know the
  * exact row counts driver-side from their convergence scalars).
  *
  * Lives in `org.apache.spark.sql` because `internalCreateDataFrame`
  * is `private[sql]`.
  */
object GraftCheckpoint {

  def localCheckpointStatsReset(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val session = ck.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(ck.queryExecution.toRdd, ck.schema, isStreaming = false)
  }
}
