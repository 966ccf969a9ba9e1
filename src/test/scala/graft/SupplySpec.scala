package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the supply-chain-science wave
  * (SupplyQueries, q345-q348): DiD's null result on untreated data,
  * SBC quadrant exhaustiveness, the nearest-rank service guarantee,
  * and newsvendor optimality on the fitting sample.
  */
class SupplySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q345 DiD: md5 split carries no real treatment — estimate near zero") {
    val Array(r) = run("q345_did_uplift").collect()
    val (n, ttPre, ttPost, ctPre, ctPost, did) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0 && ttPre > 0 && ttPost > 0 && ctPre > 0 && ctPost > 0)
    assert(did == (ttPost - ttPre) - (ctPost - ctPre), "DiD recomputes from the cells")
    // hash assignment on synthetic data: the honest estimate is a null
    // result — within 10% of the pre-period control mean
    assert(math.abs(did) < ctPre / 10,
      s"md5-assigned 'treatment' must show no material uplift (did=$did, ctPre=$ctPre)")
  }

  test("q346 SBC: quadrants partition the parts, boundaries respected") {
    val rows = run("q346_sbc_classify").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val classes = rows.map(_._1).toSet
    assert(classes.subsetOf(Set("smooth", "intermittent", "erratic", "lumpy")))
    assert(rows.map(_._2).sum > 0)
    rows.foreach { case (cls, n, meanAdi, meanCv2) =>
      assert(n > 0)
      // class means must respect the defining half-planes (means of
      // values all on one side of a cut stay on that side)
      if (cls == "smooth") { assert(meanAdi < 132 && meanCv2 < 4900) }
      if (cls == "intermittent") { assert(meanAdi >= 132 && meanCv2 < 4900) }
      if (cls == "erratic") { assert(meanAdi < 132 && meanCv2 >= 4900) }
      if (cls == "lumpy") { assert(meanAdi >= 132 && meanCv2 >= 4900) }
    }
  }

  test("q347 reorder point: nearest-rank p95 delivers >= 95% service on the sample") {
    val rows = run("q347_reorder_point").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (region, nDays, rp, maxLtd, service) =>
      assert(nDays > 0 && rp > 0)
      assert(rp <= maxLtd, "reorder point is a realized order statistic")
      assert(service >= 9500, s"region $region: nearest-rank p95 guarantees >= 95% sample service")
      assert(service <= 10000)
    }
  }

  test("q348 newsvendor: critical-ratio stock beats mean stocking on the fitting sample") {
    val rows = run("q348_newsvendor").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (region, qStar, qMean, pStar, pMean, gain) =>
      assert(qStar > 0 && qMean > 0)
      assert(gain == pStar - pMean)
      // the empirical newsvendor quantile maximizes empirical expected
      // profit over ALL stock levels, so in particular >= mean stocking
      assert(gain >= 0, s"region $region: newsvendor stock must not lose to mean stocking " +
        "(empirical profit is concave in q and q_star is its discrete argmax)")
    }
  }
}
