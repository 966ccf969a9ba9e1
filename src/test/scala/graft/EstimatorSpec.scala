package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the estimator-infrastructure wave
  * (EstimatorQueries, q361-q364): the full-outer join's three-way row
  * accounting, AMS unbiasedness bounds, priority sampling's
  * heavy-item determinism, and randomized response's debias identity.
  */
class EstimatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q361 full outer: rows = matched + both orphan kinds, all three present") {
    val Array(r) = run("q361_stream_full_outer").collect()
    val (n, m, vo, co) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == m + vo + co, "every row is exactly one of matched/view-orphan/click-orphan")
    assert(m > 0, "the fixture must produce real matches")
    assert(vo > 0, "view orphans exercise the view-side null path")
    assert(co > 0, "click orphans exercise the click-side null path")
  }

  test("q362 AMS F2: estimates positive, exact F2 >= n_keys, errors recompute") {
    val Array(r) = run("q362_ams_f2").collect()
    val (nk, f2, med, mean, errMed, errMean) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(f2 >= nk, "F2 >= number of keys (each f >= 1)")
    assert(med >= 0 && mean >= 0, "squares are nonnegative")
    assert(errMed == math.abs(med - f2) * 10000 / f2)
    assert(errMean == math.abs(mean - f2) * 10000 / f2)
  }

  test("q363 priority sampling: 100 sampled, heavy items deterministic, tau realized") {
    val Array(r) = run("q363_priority_sample").collect()
    val (nItems, wTotal, nSampled, tau, wEst, nDet, err) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nSampled == 100)
    assert(nItems > 101)
    assert(tau > 0)
    assert(wEst > 0)
    assert(err == math.abs(wEst - wTotal) * 10000 / wTotal)
    // every item with w >= tau has priority w*U div u >= w >= tau for ANY u,
    // so it beats the threshold and is sampled with probability 1: the
    // sample must contain ALL of them — checked indirectly: the count of
    // sampled heavy items can never exceed the sample size
    assert(nDet >= 0 && nDet <= 100)
  }

  test("q364 randomized response: debias identity and near-design flip rate") {
    val Array(r) = run("q364_randomized_response").collect()
    val (n, t, obs, est, flipped, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0 && t > 0)
    assert(est == (4 * obs - n) / 2, "exact debias at p = 3/4")
    assert(rate == flipped * 10000 / n)
    // md5 flip rate concentrates near the design 25% — at sf0.001's
    // ~150 respondents the binomial sd is ~3.5 points, so allow ±10
    assert(math.abs(rate - 2500) < 1000, s"realized flip rate $rate vs design 2500")
    // debias error comes only from group-wise flip imbalance — loose n/4 cap
    assert(math.abs(est - t) <= n / 4,
      "estimate deviates only by realized-vs-design flip imbalance")
  }
}
