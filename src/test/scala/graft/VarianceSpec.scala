package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the calibration/variance wave (q417-q420):
  * the Murphy identity, CUPED algebra in driver BigInt, a jackknife
  * replay, and Hampel repair soundness.
  */
class VarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q417 Murphy: the within-bin identity holds on every bin") {
    val Array(r) = run("q417_brier_murphy").collect()
    assert(r.getLong(4) == 0L, "n_k*SSE_k = rel + unc must hold per bin")
    assert(r.getLong(0) > 1 && r.getLong(1) > 0)
    assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000, "Brier in [0,1]")
    // global sums respect the identity too (sum of per-bin identities
    // scaled by n_k — here each bin already certified, so totals add up)
    assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
  }

  test("q418 CUPED: moment algebra replayed in BigInt, rho2 in range") {
    val Array(r) = run("q418_cuped").collect()
    val (vx, vy, cxy) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(vx > 0 && vy > 0)
    val rho2 = (BigInt(cxy) * BigInt(cxy) * 10000 / (BigInt(vx) * BigInt(vy))).toLong
    assert(r.getLong(6) == rho2)
    assert(rho2 >= 0 && rho2 <= 10000, "rho2 is a squared correlation")
    assert(r.getLong(10) == 10000 - rho2)
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0))
    // null experiment: adjusted difference stays near zero (both
    // engines agree exactly; this pins the magnitude is sane)
    assert(math.abs(r.getLong(9)) <= 2000000L)
  }

  test("q419 jackknife: full driver replay from per-customer totals") {
    val Array(r) = run("q419_jackknife_influence").collect()
    val pc = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev"),
        count(lit(1)).as("cnt"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val s = pc.map(_._2).sum; val t = pc.map(_._3).sum; val m = pc.length.toLong
    val rE2 = s * 100 / t
    val ds = pc.map { case (_, rev, cnt) => (s - rev) * 100 / (t - cnt) - rE2 }
    val sumD = ds.sum; val sumD2 = ds.map(d => d * d).sum
    assert(r.getLong(0) == m && r.getLong(1) == rE2)
    assert(r.getLong(2) == rE2 + sumD / m)
    assert(r.getLong(3) == (m - 1) * sumD / m)
    val jkVar = ((BigInt(m) * BigInt(sumD2) - BigInt(sumD) * BigInt(sumD))
      * (m - 1) / (BigInt(m) * m)).toLong
    assert(r.getLong(4) == jkVar)
    assert(r.getLong(4) >= 0, "a variance is nonnegative")
    val mx = ds.map(math.abs).max
    assert(r.getLong(5) == mx)
    val worst = pc.zip(ds).filter(x => math.abs(x._2) == mx).map(_._1._1).min
    assert(r.getLong(6) == worst)
  }

  test("q420 Hampel: repair only moves flagged days, toward the median") {
    val rows = run("q420_hampel_repair").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, fl, before, after) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(fl <= n)
      // zero flags => untouched sums
      if (fl == 0) assert(before == after)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "the corpus must exercise repair")
  }
}
