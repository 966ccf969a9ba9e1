package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the time-series-and-pricing wave
  * (TimePriceQueries, q357-q360): seasonal centering and strength
  * bounds, the ensemble's convex-hull guarantee, backtest grid
  * completeness, and the elasticity screen's demand-law census.
  */
class TimePriceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q357 STL-lite: 7 centered weekday effects, strengths in [0, 1e4]") {
    val rows = run("q357_stl_strength").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.sameElements(0L to 6L))
    val sSum = rows.map(_._2).sum
    // re-centering leaves |sum| < 7 (one floor-div per weekday effect)
    assert(math.abs(sSum) < 7, s"seasonal effects re-centered (sum=$sSum)")
    rows.foreach { case (_, _, n, ft, fs) =>
      assert(n > 0)
      assert(ft >= 0 && ft <= 10000)
      assert(fs >= 0 && fs <= 10000)
    }
  }

  test("q358 ensemble: combined forecast never leaves the member hull") {
    val Array(r) = run("q358_forecast_ensemble").collect()
    val nTest = r.getLong(0)
    val (wN, wS, wM) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val outside = r.getLong(8)
    assert(nTest > 0)
    assert(wN >= 1 && wS >= 1 && wM >= 1)
    // a weight-floored mean of member forecasts stays within ±1 of the
    // hull; the query counts STRICT exits, which must be zero
    assert(outside == 0, "weighted mean must stay inside [min f_i, max f_i]")
  }

  test("q359 backtest matrix: full origin-by-horizon grid, APEs recompute") {
    val rows = run("q359_backtest_matrix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 6, "3 origins x 2 horizons")
    assert(rows.map(x => (x._1, x._2)).distinct.length == 6)
    rows.foreach { case (_, h, actual, fOls, fNaive, apeO, apeN) =>
      assert(h == 1 || h == 2)
      assert(actual > 0)
      assert(apeO == math.abs(actual - fOls) * 10000 / actual)
      assert(apeN == math.abs(actual - fNaive) * 10000 / actual)
    }
  }

  test("q360 elasticity: census is internally consistent, medians realized") {
    val rows = run("q360_price_elasticity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (brand, n, neg, share, _) =>
      assert(brand.nonEmpty && n > 0)
      assert(neg >= 0 && neg <= n)
      assert(share == neg * 10000 / n)
    }
  }
}
