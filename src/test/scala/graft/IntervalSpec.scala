package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the interval-algebra and attribution wave
  * (IntervalQueries, q373-q376): Allen partition totality, lift
  * recomputation, removal-effect bounds, and the bit-level
  * inclusion-exclusion identity.
  */
class IntervalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q373 Allen census: relations partition the orders, impossible ones absent") {
    import org.apache.spark.sql.functions._
    val rows = run("q373_allen_census").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = rows.map(_._2).sum
    val nOrders = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey").distinct().count()
    assert(total == nOrders, "the 13 relations partition ALL interval pairs")
    val rels = rows.map(_._1).toSet
    val allowed = Set("precedes", "meets", "overlaps", "finished_by", "contains",
      "starts", "equals", "started_by", "during", "finishes", "overlapped_by",
      "met_by", "preceded_by")
    assert(rels.subsetOf(allowed), s"unknown relation name in $rels")
    // the activity interval always contains o_orderdate, which lies
    // inside its own quarter [b1, b2] — so the two intervals always
    // intersect and the strictly-disjoint relations cannot occur
    assert(!rels.contains("precedes"), "a2 >= o_orderdate >= b1")
    assert(!rels.contains("preceded_by"), "a1 <= o_orderdate <= b2")
  }

  test("q374 temporal basket: lift recomputes, pairs canonical") {
    val rows = run("q374_temporal_basket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 20)
    import org.apache.spark.sql.functions._
    val nCust = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey").distinct().count()
    rows.foreach { case (pa, pb, both, na, nb, lift) =>
      assert(pa < pb)
      assert(both >= 1 && both <= math.min(na, nb))
      assert(lift == both * nCust * 10000 / (na * nb))
    }
  }

  test("q375 Markov removal: every effect in [0, 1], channels sum to >= full path mass") {
    val rows = run("q375_markov_removal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val p2 = rows.head._2
    assert(p2 > 0, "the chain must carry some conversion probability")
    rows.foreach { case (ch, p2r, touched, eff) =>
      assert(p2r == p2)
      assert(touched >= 0 && touched <= p2)
      assert(eff >= 0 && eff <= 10000)
      assert(eff == touched * 10000 / math.max(p2, 1), s"channel $ch")
    }
  }

  test("q376 bitmap algebra: zero violations, bitmaps agree with set counts") {
    val Array(r) = run("q376_bitmap_algebra").collect()
    val (nWords, popA, popB, popOr, popAnd, viol, gap, matches) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7))
    assert(nWords > 0 && popA > 0 && popB > 0)
    assert(viol == 0, "popcount inclusion-exclusion must hold on every word")
    assert(gap == 0, "aggregate inclusion-exclusion gap must be exactly zero")
    assert(popAnd <= math.min(popA, popB))
    assert(popOr >= math.max(popA, popB))
    assert(matches, "bitmap popcounts must equal set-level distinct counts")
  }
}
