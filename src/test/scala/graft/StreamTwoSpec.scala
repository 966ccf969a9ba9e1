package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the second streaming wave (StreamTwoQueries,
  * q313-q316): PIT versions split the event mass, the trigger ledger
  * shows exactly one batch per part file, histogram state is
  * bucket-bounded with ordered percentile brackets, and the DLQ census
  * reconciles to the source exactly.
  */
class StreamTwoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q313 stream SCD2: both version families present, mass conserved") {
    val rows = run("q313_stream_scd2_join").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val (v2, v1) = rows.partition(_._1.startsWith("V2-"))
    assert(v1.nonEmpty, "events before the version boundary must hit v1 rows")
    assert(v2.nonEmpty, "events after the version boundary must hit v2 rows")
    // the stream-static PIT join assigns every matchable event exactly once
    val total = rows.map(_._2).sum
    val matchable = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id")), Seq("user_id"), "left_semi")
      .count()
    assert(total == matchable, s"joined mass $total != matchable events $matchable")
  }

  test("q314 trigger ledger: exactly 5 single-file batches covering all events") {
    val Array(r) = run("q314_trigger_ledger").collect()
    val (n, total, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == 5, s"maxFilesPerTrigger=1 over 5 part files must give 5 batches, got $n")
    assert(total == Tables.events(spark, sf).count())
    assert(lo > 0 && lo <= hi)
  }

  test("q315 stream histogram: p50 ≤ p90, buckets bracket the true quantiles") {
    val Array(r) = run("q315_stream_histogram").collect()
    val (n, p50b, p50lo, p90b, p90lo) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == Tables.events(spark, sf).filter(col("value") > 0).count())
    assert(p50b <= p90b)
    assert(p50lo == (1L << p50b) && p90lo == (1L << p90b))
    // the true exact median falls inside the p50 bucket
    val median = Tables.events(spark, sf).filter(col("value") > 0)
      .select(expr("percentile(cast(round(value*1000000) as bigint), 0.5)"))
      .collect()(0).getDouble(0)
    assert(median >= p50lo && median < (p50lo << 1),
      s"true median $median outside the p50 bucket [$p50lo, ${p50lo << 1})")
  }

  test("q316 dead letter: main + dlq = source, corruption rate matches the mod") {
    val Array(r) = run("q316_dead_letter").collect()
    val (nMain, nDlq, nTypes, nSource) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val events = Tables.events(spark, sf)
    assert(nSource == events.count(), "no silent drops: main + dlq must cover the source")
    val expectBad = events.filter(expr("event_id % 37 = 0")).count()
    assert(nDlq == expectBad, s"DLQ $nDlq != deterministic corruption count $expectBad")
    assert(nMain == nSource - nDlq)
    assert(nTypes >= 1)
  }
}
