package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the consistency-and-governance wave
  * (ConsistencyQueries, q381-q384): the upsert-landed table equals the
  * batch recompute, SAR export receipts are stable, the join-size
  * identity holds exactly, and the rollup lattice reconciles.
  */
class ConsistencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q381 update-mode upsert: landed table equals the batch recompute exactly") {
    import org.apache.spark.sql.functions._
    val landed = run("q381_update_mode_upsert").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(unix_micros(col("ts"))).as("last_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(landed.sameElements(batch),
      "update-mode emissions merged by upsert must reproduce the batch aggregate")
  }

  test("q382 SAR export: receipts deterministic across two runs, counts positive") {
    val a = run("q382_sar_export").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(5)))
    val b = run("q382_sar_export").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(5)))
    assert(a.nonEmpty)
    assert(a.sameElements(b), "same data must yield the same disclosure receipts")
    a.foreach { case (_, n, spend, md) =>
      assert(n > 0 && spend > 0)
      assert(md.length == 32)
    }
  }

  test("q383 fan-out ledger: predicted join size equals the actual join exactly") {
    val Array(r) = run("q383_fanout_ledger").collect()
    val predicted = r.getLong(0)
    val actual = r.getLong(3)
    val holds = r.getBoolean(5)
    assert(predicted == actual, "sum of per-key l*r must equal the realized join size")
    assert(holds)
    assert(predicted > 0)
  }

  test("q384 rollup lattice: zero mismatched cells at every level, totals equal") {
    val rows = run("q384_rollup_lattice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet == Set("1_week", "2_month", "3_quarter"))
    val totals = rows.map(_._4).distinct
    assert(totals.length == 1, "every grain must sum to the same corpus revenue")
    rows.foreach { case (level, cells, mism, _) =>
      assert(cells > 0)
      assert(mism == 0, s"$level: direct and day-derived rollups must agree bit-exactly")
    }
  }
}
