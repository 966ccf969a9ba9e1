package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the semantics-and-repair wave
  * (SemanticsQueries, q341-q344): window-builtin bounds and the
  * lead-default path, FD repair's accounting identity and collateral
  * zero, business-day landing rules, and the outer join's null rows
  * being exactly the match-free clicks.
  */
class SemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q341 window matrix: builtin bounds hold, lead takes the default") {
    val rows = run("q341_window_matrix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, pr, cd, nt, leadX) =
        (r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(4))
      assert(pr >= 0 && pr <= 1000000, "percent_rank in [0, 1]")
      assert(cd > 0 && cd <= 1000000, "cume_dist in (0, 1]")
      assert(nt >= 1 && nt <= 4)
      assert(leadX == -1, "the latest day's lead must take the explicit default")
      assert(nDays > 1, "series must be non-trivial for rank semantics to bind")
    }
  }

  test("q342 FD repair: accounting identity, zero collateral, high repair rate") {
    val Array(r) = run("q342_fd_repair").collect()
    val (nRows, nDirty, nRep, nUnrep, nColl, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))
    assert(nDirty > 0 && nDirty < nRows / 10, "~3% corruption")
    assert(nRep + nUnrep == nDirty, "every dirty row is either repaired or not")
    assert(nColl == 0, "sub-50% per-key corruption must never damage clean rows")
    assert(rate > 5000, "majority vote should fix most of a 3% corruption")
    assert(rate == nRep * 10000 / math.max(nDirty, 1))
  }

  test("q343 business days: all settlements land Mon-Fri, offsets match the table") {
    val rows = run("q343_business_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.sameElements(0L to 6L), "all seven weekdays present")
    val table = Map(0L -> 3L, 1L -> 3L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 4L, 6L -> 3L)
    rows.foreach { case (dowm, n, off, maxSettle, weekend) =>
      assert(n > 0)
      assert(off == table(dowm), s"weekday $dowm: closed-form offset")
      assert(maxSettle <= 4, s"weekday $dowm: settlement must land Mon-Fri")
      assert(weekend == 0)
    }
  }

  test("q344 stream outer join: null rows = match-free clicks, one row per unmatched") {
    val Array(r) = run("q344_stream_outer_join").collect()
    val (nRows, nClicks, nMatched, nNull) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nRows == nMatched + nNull)
    assert(nNull > 0, "the fixture must exercise the watermark-expired null path")
    assert(nMatched + nNull >= nClicks, "every click appears at least once")
    // a click is EITHER matched (>= 1 pair rows) or null (exactly one row),
    // never both — so null rows can be at most the clicks without a match
    assert(nNull <= nClicks)
    assert(nMatched >= nClicks - nNull, "matched clicks emit at least one pair each")
  }
}
