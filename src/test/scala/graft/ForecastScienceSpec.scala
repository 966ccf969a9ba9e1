package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the forecast-science wave
  * (ForecastScienceQueries, q325-q328): quantile monotonicity and the
  * pinball asymmetry, the floor-bounded hierarchical coherence gap,
  * Croston's fold replayed driver-side, and FVA's fixed-point at the
  * naive baseline.
  */
class ForecastScienceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q325 pinball: p10 <= p50 <= p90 per priority, 8 test weeks, loss >= 0") {
    val rows = run("q325_pinball_loss").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 15, "5 priorities x 3 taus")
    rows.groupBy(_._1).foreach { case (p, g) =>
      val byTau = g.sortBy(_._2).map(_._5)
      assert(byTau(0) <= byTau(1) && byTau(1) <= byTau(2),
        s"$p: nearest-rank quantiles must be monotone in tau")
    }
    rows.foreach { case (_, _, nTrain, nTest, _, loss) =>
      assert(nTest == 8, "test window is exactly the last 8 weeks")
      assert(nTrain > 100, "train series is spine-filled (includes zero weeks)")
      assert(loss >= 0)
    }
  }

  test("q326 coherence: gap bounded by nation count (per-nation floors only)") {
    val rows = run("q326_hier_coherence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 5, "five regions")
    rows.foreach { case (rn, direct, bu, gap, nNat) =>
      assert(gap == direct - bu)
      // direct = floor(T/4); bottom-up = sum of floor(t_i/4) with sum(t_i) = T,
      // so 0 <= direct - bu <= n_nations - 1 ... except direct's own floor can
      // shave one more: the provable bound is |gap| < n_nations.
      assert(gap >= 0 && gap < nNat,
        s"$rn: coherence gap $gap must be the floor residue, < $nNat")
    }
  }

  test("q327 croston: fold replays driver-side in BigInt") {
    val rows = run("q327_croston").collect()
    assert(rows.nonEmpty)
    // Recompute each emitted part's fold from the raw lineitem fixture.
    val ev = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "cast(datediff(to_date(l_shipdate), '1995-01-01') as long) as day",
        "cast(round(l_quantity) as long) as q")
      .groupBy("l_partkey", "day")
      .agg(org.apache.spark.sql.functions.sum("q").as("qd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(t => (t._2, t._3)).sortBy(_._1) }
    def sdiv(a: BigInt, b: BigInt): BigInt = if (a >= 0) a / b else -((-a) / b)
    rows.foreach { r =>
      val (pk, n, z, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val evs = ev(pk)
      assert(n == evs.length && n >= 2)
      var (zz, pp, prev) = (BigInt(evs.head._2) * 10000, BigInt(0), BigInt(evs.head._1))
      evs.tail.foreach { case (d, q) =>
        zz = zz + sdiv(BigInt(q) * 10000 - zz, 5)
        val ir = (BigInt(d) - prev) * 10000
        pp = if (pp == 0) ir else pp + sdiv(ir - pp, 5)
        prev = BigInt(d)
      }
      assert(zz == z && pp == p, s"part $pk: fold must replay exactly")
      assert(r.getLong(4) == (zz * 10000 / pp.max(1)).toLong)
    }
  }

  test("q328 FVA: naive rows are the zero fixed-point, others bounded by 1e4") {
    val rows = run("q328_forecast_fva").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 15, "5 priorities x 3 methods")
    rows.foreach { case (_, nTest, method, mae, fva) =>
      assert(nTest == 8)
      assert(mae >= 0)
      if (method == "naive") assert(fva == 0, "FVA of the baseline against itself is 0")
      assert(fva <= 10000, "can never remove more than all of the naive error")
    }
    assert(rows.map(_._3).distinct.sorted.sameElements(Seq("ma13", "ma4", "naive")))
  }
}
