package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the survival-and-reliability wave
  * (ReliabilityQueries, q349-q352): a driver-side BigInt replay of the
  * KM fold, monotonicity and censoring accounting, hazard/at-risk
  * bookkeeping, MRL positivity, and the exact risk-pooling identity.
  */
class ReliabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q349 KM: driver BigInt replay matches the packed fold exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("q349_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 7L, 14L, 30L, 60L, 90L, 180L, 365L))
    // independent replay from the raw orders table
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey").as("cust"), to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val maxd = o.map(_._2).max
    val durs = o.groupBy(_._1).values.flatMap { os =>
      val sorted = os.sortBy(x => (x._2.toEpochDay, x._3))
      sorted.sliding(2).collect {
        case Array(a, b) => (b._2.toEpochDay - a._2.toEpochDay, true)
      }.toSeq :+ ((maxd.toEpochDay - sorted.last._2.toEpochDay, false))
    }.toSeq
    val grain = durs.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val n0 = durs.size.toLong
    for ((k, sE6, atRisk, nEv) <- rows) {
      var s = BigInt(1000000); var n = BigInt(n0); var ev = 0L
      for ((t, d, c) <- grain if t <= k) {
        s = s * (n - d) / n // floor per event time — the engine's e6 discipline
        n = n - d - c
        ev += d
      }
      assert(s.toLong == sE6, s"k=$k survival")
      assert(n.toLong == atRisk, s"k=$k at-risk")
      assert(ev == nEv, s"k=$k event count")
    }
    // survival is non-increasing in k; at-risk strictly consumes
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q350 hazard: at-risk chain reconciles, hazards in [0, 1e6]") {
    val rows = run("q350_hazard_buckets").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val n0 = rows.head._4 // first bucket's at-risk = everyone
    assert(n0 == rows.map(x => x._2 + x._3).sum, "first at-risk = all subjects")
    rows.sliding(2).foreach {
      case Array((_, d, c, ar, _), (_, _, _, ar2, _)) =>
        assert(ar2 == ar - d - c, "at-risk consumes exactly the resolved rows")
      case _ => ()
    }
    rows.foreach { case (_, d, _, ar, h) =>
      assert(h >= 0 && h <= 1000000)
      assert(h == d * 1000000 / ar)
    }
  }

  test("q351 MRL: residual life positive where events remain") {
    val rows = run("q351_mean_residual_life").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.head._1 == 0L)
    rows.foreach { case (k, nGt, mrl) =>
      assert(nGt > 0)
      assert(mrl >= 0, s"k=$k: E[T-k | T>k] is nonnegative by construction")
    }
  }

  test("q352 risk pooling: the covariance identity holds EXACTLY per region") {
    val rows = run("q352_risk_pooling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (r, nNat, vPool, sumV, gap, ratio) =>
      assert(nNat > 0 && vPool > 0)
      assert(gap == 0L,
        s"region $r: V_pool = Sigma V_i + 2 Sigma C_ij must hold exactly — both sides computed independently")
      assert(ratio == sumV * 10000 / vPool)
    }
  }
}
