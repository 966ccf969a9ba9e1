package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the second signals wave (SignalsTwoQueries,
  * q305-q308): TextRank ranks sum sensibly and stay in the damping
  * band, source cos² is bounded and symmetric-by-construction,
  * coverage/novelty are bounded rationals, and the burn-down's
  * exhaustion day actually exceeds budget.
  */
class SignalsTwoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q305 TextRank: 20 ranked keywords, PR above the damping floor") {
    val rows = run("q305_textrank_keywords").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 20)
    assert(rows.map(_._1).sorted.sameElements(1L to 20L))
    rows.foreach { case (_, w, pr) =>
      assert(w.nonEmpty)
      assert(pr >= 150000, "a node with any inflow sits above the 0.15 damping floor")
    }
    val byRank = rows.sortBy(_._1).map(_._3)
    assert(byRank.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q306 source similarity: cos² ∈ (0, 1e6], ordered pairs, top-20") {
    val rows = run("q306_source_similarity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (sa, sb, c2) =>
      assert(sa < sb)
      assert(c2 > 0 && c2 <= 1000000,
        s"cos² $c2 out of (0, 1e6] — Cauchy-Schwarz violated or degenerate vectors")
    }
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q307 rec coverage: bounded rationals, recommended ⊆ catalog") {
    val Array(r) = run("q307_rec_coverage").collect()
    val (cat, rec, cov, slots, nov) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(rec <= cat)
    assert(cov == rec * 10000 / cat)
    assert(slots > 0)
    assert(nov > 0 && nov <= 10000, "mean popularity rank is within the catalog")
  }

  test("q308 error budget: exhaustion day only when days_over > 0, rates exact") {
    val rows = run("q308_error_budget").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ev, err, rate, daysOver) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(err <= ev)
      assert(rate == err * 10000 / ev)
      if (daysOver == 0) assert(r.isNullAt(5), "no exhaustion day when never over budget")
      else assert(!r.isNullAt(5), "days over budget must name the first exhaustion day")
    }
  }
}
