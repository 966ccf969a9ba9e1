package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the lattice/advisor waves (q462-q466):
  * PH detection discipline, HRU bound + brute-force agreement,
  * DKW band, alias reconstruction, V-optimal dominance.
  */
class LatticeAdvisorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q462 Page-Hinkley: every incident caught, no false alarms") {
    val Array(r) = run("q462_page_hinkley").collect()
    assert(r.getLong(1) >= 1L, "incidents injected")
    assert(r.getLong(2) == r.getLong(1),
      "one alarm per injected incident (reset discipline)")
    assert(r.getLong(5) == 1L, "every alarm lands on an incident day")
    assert(r.getLong(4) > 2000L, "statistic actually crossed lambda")
  }

  test("q463 HRU: bound certified, greedy structure sane") {
    val Array(r) = run("q463_view_selection").collect()
    assert(r.getLong(5) == 1L, "(1-1/e) bound vs the brute-force optimum")
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(0),
      "opt <= greedy <= base")
    val gm = r.getLong(6)
    assert(java.lang.Long.bitCount(gm) == 3, "greedy picked exactly 3 views")
    assert((gm & 0x80L) == 0L, "apex never in the candidate mask")
    if (r.getLong(8) == 1L) assert(r.getLong(1) == r.getLong(2))
  }

  test("q464 DKW: the 99% band event holds, deviation positive") {
    val Array(r) = run("q464_dkw_band").collect()
    assert(r.getLong(5) == 1L, "sup-deviation inside the DKW band")
    assert(r.getLong(3) > 0L && r.getLong(3) < r.getLong(4))
    assert(r.getLong(1) < r.getLong(0))
  }

  test("q465 alias table: exact reconstruction on every column") {
    val rows = run("q465_alias_table").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getLong(4) == 1L, s"nation ${r.getLong(0)}: reconstruction")
      assert(r.getLong(2) >= 0L)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 24L, "alias in range")
    }
    // total cell mass is exactly K*W
    val w = rows.map(_.getLong(1)).sum
    val probs = rows.map(_.getLong(2)).sum
    val slack = rows.map(r => w - r.getLong(2)).sum
    assert(probs + slack == 25L * w, "mass conservation across cells")
  }

  test("q466 V-optimal: monotone in B, never worse than equi-width") {
    val rows = run("q466_voptimal_histogram").collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getLong(4) == 1L, s"B=${r.getLong(0)}"))
    val curve = rows.map(_.getLong(2))
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a },
      "more buckets never hurt")
    assert(rows.head.getLong(2) == rows.head.getLong(3),
      "B=1: both histograms are the single bucket")
  }
}
