package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ranking-evaluation wave (RankEvalQueries,
  * q275-q278): the AUC matches a brute-force pairwise recompute, nDCG is
  * bounded and ideal-dominated, Kendall pairs partition exactly, and the
  * RBO curve is monotone with per-term weight domination.
  */
class RankEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q275 AUC: matches the O(n²) pairwise definition on the small fixture") {
    val Array(r) = run("q275_auc_mannwhitney").collect()
    val (npos, nneg, aucE6) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(npos > 0 && nneg > 0)
    assert(aucE6 >= 0 && aucE6 <= 1000000)
    // brute force: P(score⁺ > score⁻) + ½P(tie), floored at e6 — the
    // definition the rank-sum identity is supposed to equal exactly
    val rows = Tables.events(spark, sf)
      .select(round(col("value") * 1000000).cast("long").as("v6"),
        (col("event_type") === "purchase").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    assert(pos.length.toLong == npos && neg.length.toLong == nneg)
    var wins2 = 0L // 2·wins + ties, so the half-credit stays integral
    for (p <- pos; n <- neg) {
      if (p > n) wins2 += 2 else if (p == n) wins2 += 1
    }
    val expect = wins2 * 1000000L / (2L * npos * nneg)
    assert(aucE6 == expect, s"rank-sum AUC $aucE6 != pairwise $expect")
  }

  test("q276 nDCG: bounded by 1, ideal dominates, discounts monotone") {
    val Array(r) = run("q276_ndcg").collect()
    val (dcg, idcg, ndcg) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(idcg > 0, "fixture must contain docs with query terms")
    assert(dcg <= idcg, "ideal ranking must dominate the qtf ranking")
    assert(ndcg >= 0 && ndcg <= 1000000)
    assert(ndcg == dcg * 1000000L / idcg)
  }

  test("q277 Kendall: pairs partition exactly (total orders, no ties)") {
    val Array(r) = run("q277_kendall_tau").collect()
    val (nPairs, c, d, tau) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nPairs == 190, s"20 docs must yield C(20,2)=190 pairs, got $nPairs")
    assert(c + d == nPairs, "id tiebreaks make every pair concordant xor discordant")
    assert(tau >= -1000000 && tau <= 1000000)
    assert(tau == java.lang.Math.floorDiv((c - d) * 1000000L, nPairs))
  }

  test("q278 RBO: X_d monotone non-decreasing, X_d ≤ d, terms weight-bounded") {
    val rows = run("q278_rbo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    val rbo = rows.head._4
    rows.foreach { case (depth, xd, term, total) =>
      assert(xd <= depth, s"depth $depth: intersection $xd exceeds depth")
      assert(term <= 100000000000L, s"depth $depth: term exceeds the d=1 weight")
      assert(total == rbo, "total column constant across depth rows")
    }
    val xs = rows.sortBy(_._1).map(_._2)
    assert(xs.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "prefix intersections must be monotone")
    assert(rbo == rows.map(_._3).sum, "total = Σ per-depth terms")
    assert(rbo >= 0 && rbo <= 1000000000000L)
  }
}
