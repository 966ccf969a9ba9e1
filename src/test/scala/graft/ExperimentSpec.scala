package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the experimentation wave (ExperimentQueries,
  * q309-q312): the t² statistic replays from driver-side BigInt
  * staging, CUPED's ρ² is a bounded correlation, QTE deciles are
  * monotone within each group, and the SRM flag matches its χ²
  * cross-multiplication.
  */
class ExperimentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q309 Welch t²: replays from BigInt staging, flag consistent") {
    val Array(r) = run("q309_welch_t2").collect()
    val (n1, n2, t2, sig) = (r.getLong(0), r.getLong(1), r.getLong(4), r.getBoolean(5))
    assert(n1 > 1 && n2 > 1)
    assert(t2 >= 0)
    assert(sig == (t2 > 38416))
    // driver-side replay with the SAME staged floors
    val moments = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), round(col("value")).cast("long").as("v0"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) =>
        val xs = vs.map(_._2).map(BigInt(_))
        k -> ((BigInt(xs.length), xs.sum, xs.map(x => x * x).sum))
      }
    val (bn1, s1, q1) = moments("purchase"); val (bn2, s2, q2) = moments("click")
    val a = bn1 * q1 - s1 * s1; val b = bn2 * q2 - s2 * s2
    val dnum = s1 * bn2 - s2 * bn1
    val msq = dnum * dnum * 10000 / (bn1 * bn2 * bn1 * bn2)
    val se2 = a * 100000000 / (bn1 * bn1 * (bn1 - 1)) + b * 100000000 / (bn2 * bn2 * (bn2 - 1))
    val expect = (msq * 100000000 / se2.max(BigInt(1))).toLong
    assert(t2 == expect, s"engine t² $t2 != replay $expect")
  }

  test("q310 CUPED: ρ² ∈ [0, 1e6], θ sign matches covariance sign") {
    val Array(r) = run("q310_cuped").collect()
    val (n, theta, rho2, varx, vary) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 2)
    assert(varx > 0 && vary > 0, "degenerate covariate — fixture broken")
    assert(rho2 >= 0 && rho2 <= 1000000, "ρ² is a squared correlation")
    // θ and ρ² consistent: ρ² = 0 ⟺ cov = 0 ⟹ θ = 0
    if (rho2 == 0) assert(theta == 0)
  }

  test("q311 QTE: 9 deciles, each group's quantile ladder is monotone") {
    val rows = run("q311_qte").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length == 9)
    assert(rows.map(_._1).sameElements(1L to 9L))
    val urg = rows.map(_._2); val low = rows.map(_._3)
    assert(urg.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)), "urgent ladder monotone")
    assert(low.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)), "low ladder monotone")
    rows.foreach { case (_, u, l, d) => assert(d == u - l) }
  }

  test("q312 SRM: χ² matches its cross-multiplication, arms partition events") {
    val rows = run("q312_srm_daily").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val total = rows.map(t => t._1 + t._2).sum
    assert(total == Tables.events(spark, sf).count())
    rows.foreach { case (na, nb, chi2, flag) =>
      assert(chi2 == (na - nb) * (na - nb) * 10000 / (na + nb))
      assert(flag == (10000 * (na - nb) * (na - nb) > 38416 * (na + nb)))
    }
  }
}
