package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ranking-metrics wave (q393-q396):
  * driver brute-force replays of AUC and AP (the all-pairs / all-ranks
  * definitions the distributed forms must equal), kappa contingency
  * identities, and the closed-form checks on the correlation pair.
  */
class RankMetricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val scored: Array[(Long, Long, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q393 AUC equals the brute-force pair definition") {
    val Array(r) = run("q393_roc_auc").collect()
    val (nPos, nNeg, u2, auc) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    val pos = scored.filter(_._3 == 1L).map(_._2)
    val neg = scored.filter(_._3 == 0L).map(_._2)
    assert(nPos == pos.length && nNeg == neg.length)
    // all-pairs Mann-Whitney: wins count 2, ties count 1 (doubled U)
    var w2 = 0L
    for (p <- pos; q <- neg) w2 += (if (p > q) 2L else if (p == q) 1L else 0L)
    assert(u2 == w2, "score-grain rank-sum must equal the all-pairs count")
    assert(auc == w2 * 1000000L / (2L * pos.length * neg.length))
    assert(auc >= 0L && auc <= 1000000L)
  }

  test("q394 AP equals the sequential precision-at-hit replay") {
    val Array(r) = run("q394_average_precision").collect()
    val (nPos, sumPrec, ap) = (r.getLong(0), r.getLong(2), r.getLong(3))
    val ordered = scored.sortBy(x => (-x._2, x._1))
    var cum = 0L; var sp = 0L; var np = 0L
    ordered.zipWithIndex.foreach { case ((_, _, p), i) =>
      if (p == 1L) { cum += 1; np += 1; sp += cum * 1000000L / (i + 1) }
    }
    assert(nPos == np && sumPrec == sp && ap == sp / np)
    assert(ap > 0L && ap <= 1000000L)
  }

  test("q395 kappa: marginals sum to n, kappa below agreement, bounds hold") {
    val Array(r) = run("q395_cohens_kappa").collect()
    val (a, b, c, d, n) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val (agree, kappa) = (r.getLong(5), r.getLong(6))
    assert(a + b + c + d == n && n > 0)
    // NTILE(2) halves differ by ≤ 1 row on each rater's margin
    assert(math.abs((a + b) - (c + d)) <= 1, "rater A must cut at the median")
    assert(math.abs((a + c) - (b + d)) <= 1, "rater B must cut at the median")
    assert(agree >= 0 && agree <= 1000000)
    assert(kappa >= -1000000 && kappa <= 1000000)
    // chance correction can only shrink agreement toward 0
    assert(kappa <= agree)
  }

  test("q396 correlation pair: pair-census identities and bounds") {
    val Array(r) = run("q396_rank_correlation").collect()
    val (n, sumD2, conc, disc, rho, tau) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0)
    // every unordered pair is concordant or discordant (no rank ties:
    // ranks are a permutation by the tie-broken total order)
    assert(conc + disc == n * (n - 1) / 2)
    assert(rho >= -1000000 && rho <= 1000000)
    assert(tau >= -1000000 && tau <= 1000000)
    // both measure the same monotone association — signs agree unless
    // one is ~0 (floor noise)
    if (math.abs(rho) > 10000 && math.abs(tau) > 10000)
      assert(rho.sign == tau.sign)
    // ρ = 1 ⟺ Σd² = 0 consistency
    if (sumD2 == 0) assert(rho == 1000000)
  }
}
