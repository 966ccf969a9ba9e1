package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the third planner wave (PlannerTwoQueries,
  * q317-q320): the bake-off's zone maps cover the probe space sanely,
  * estimator feedback is conservative (whole-bucket floor ⇒ est ≤
  * act), join-order truth obeys containment identities, and the
  * partition advisor's pow-2 ceiling is the true next power.
  */
class PlannerTwoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q317 bake-off: touched files within the 16-file layouts, touches bounded") {
    val rows = run("q317_layout_bakeoff").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.sameElements(Array("1_linear", "2_zorder")))
    rows.foreach { case (_, nTouched, touches, avgE2) =>
      assert(nTouched >= 1 && nTouched <= 16)
      assert(touches >= nTouched && touches <= 20 * 16)
      assert(avgE2 == touches * 5)
    }
  }

  test("q318 estimator feedback: whole-bucket floor makes every estimate ≤ actual") {
    val rows = run("q318_estimator_feedback").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 10)
    val calib = rows.head._5
    rows.foreach { case (_, est, act, err, c) =>
      assert(est <= act, "whole-buckets-contained floor can never over-estimate")
      assert(err <= 0, "conservative estimator ⇒ non-positive signed error")
      assert(c == calib, "calibration factor constant across probe rows")
    }
    assert(calib >= 10000, "Σact ≥ Σest ⇒ calibration ≥ 1")
  }

  test("q319 join-order truth: containment identities hold") {
    val Array(r) = run("q319_join_order_truth").collect()
    val (cLi, cO, cC, cLiO, cOC, cFin, best) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))
    assert(cLiO <= cLi, "orderkey is unique in orders — li⋈o cannot exceed li")
    assert(cOC <= cO, "custkey is unique in customer — o⋈c cannot exceed o")
    assert(cFin <= cLiO, "adding the customer filter-join can only shrink")
    assert(cC > 0 && cO > 0)
    assert(best == (if (cLiO <= cOC) "li_join_o" else "o_join_c"))
  }

  test("q320 partition advisor: pow2 is the exact next power of parts_128mb") {
    val rows = run("q320_partition_advisor").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(rows.length == 6)
    rows.foreach { case (_, nRows, parts, pow2) =>
      assert(nRows > 0 && parts >= 1)
      assert(pow2 >= parts, "pow2 ceiling cannot be below the target")
      assert(pow2 < 2 * parts || parts == 1, "pow2 is the NEXT power, not a later one")
      assert((pow2 & (pow2 - 1)) == 0, "pow2 must be a power of two")
    }
  }
}
