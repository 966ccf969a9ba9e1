package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the integrity-engineering wave
  * (q467-q470): Luhn guarantees, Zeller agreement, partition balance
  * exactness, group-testing economics.
  */
class IntegrityTwoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q467 Luhn: both guarantees certified, blind spot reconciled") {
    val Array(r) = run("q467_luhn_audit").collect()
    assert(r.getLong(2) == 1L, "every protected key validates")
    assert(r.getLong(4) == 1L, "every single-digit bump caught")
    assert(r.getLong(8) == 1L,
      "transpositions caught = all - noops - 09/90 blind pairs, exactly")
    assert(r.getLong(5) + r.getLong(6) + r.getLong(7) == r.getLong(0))
  }

  test("q468 Zeller: congruence agrees with the anchor derivation") {
    val Array(r) = run("q468_zeller").collect()
    assert(r.getLong(1) == 0L, "zero mismatches across all corpus dates")
    assert(r.getLong(4) == 1L)
    assert(r.getLong(0) > 100L)
  }

  test("q469 partition balance: exact schemes within 1, hash measured") {
    val rows = run("q469_partition_balance").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(5) == 1L, s"${r.getString(0)}: exactness")
      assert(r.getLong(2) >= r.getLong(3))
      if (r.getString(0) != "1_hash")
        assert(r.getLong(2) - r.getLong(3) <= 1L, "ntile/RR within one row")
    }
    val hash = rows.find(_.getString(0) == "1_hash").get
    val rng = rows.find(_.getString(0) == "2_range").get
    assert(hash.getLong(4) >= rng.getLong(4),
      "hash imbalance at least the exact scheme's")
  }

  test("q470 group testing: pooling saves tests, accounting closes") {
    val rows = run("q470_group_testing").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == rows.head.getLong(2), "same items every arm")
      assert(r.getLong(3) >= r.getLong(1), "at least one test per pool")
      assert(r.getLong(3) <= r.getLong(1) + r.getLong(2),
        "at most stage1 + everyone retested")
      assert(r.getLong(5) == 1L, "pooling beats individual testing at ~3%")
    }
    // pools * target covers the items (last pool may be partial)
    rows.foreach { r =>
      assert(r.getLong(1) * r.getLong(0) >= r.getLong(2))
      assert((r.getLong(1) - 1) * r.getLong(0) < r.getLong(2))
    }
  }
}
