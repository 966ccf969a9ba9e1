package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the state-bridge wave (BridgeQueries,
  * q385-q388): snapshot-resume exactness, shard-quantile rank bounds,
  * late-dimension reconciliation gaps, and the PVM bridge residual.
  */
class BridgeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q385 snapshot-resume: zero mismatches — checkpointed state is exact") {
    val Array(r) = run("q385_snapshot_resume").collect()
    val (n, mism) = (r.getLong(0), r.getLong(1))
    assert(n > 0)
    assert(mism == 0,
      "fold(all) must equal fold(tail, seed=fold(head)) for Markov state")
  }

  test("q386 shard quantiles: every estimate within the rank-error bound") {
    val rows = run("q386_shard_quantiles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { case (p, n, trueRank, target, err, within) =>
      assert(trueRank >= 1 && trueRank <= n)
      assert(err == math.abs(trueRank - target))
      assert(within, s"p$p estimate must sit within N/10 ranks of the target (err=$err, n=$n)")
    }
  }

  test("q387 late dimension: known + reclassified = final, per nation") {
    val rows = run("q387_late_dimension").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    var anyReclassified = false
    rows.foreach { case (nat, p1, rc, p2, gap) =>
      assert(gap == 0L, s"nation $nat: the backfill must reconcile exactly")
      assert(p1 + rc == p2)
      if (rc > 0) anyReclassified = true
    }
    assert(anyReclassified, "the late third must actually carry revenue")
  }

  test("q388 PVM bridge: effects sum to the delta within the rounding residual bound") {
    val Array(r) = run("q388_pvm_bridge").collect()
    val (nBoth, deltaBoth, price, vol, cross, newC, lostC, deltaTotal, gap) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    assert(nBoth > 0)
    // per-part: price_eff + vol_eff + cross_eff == r1 - r0 EXACTLY (the
    // cross term is defined as the residual), so the only gap source is
    // the new/lost edge partition — which is also exact: gap must be 0
    assert(price + vol + cross == deltaBoth, "within-part effects partition the both-months delta")
    assert(deltaBoth + newC - lostC == deltaTotal)
    assert(gap == 0L, "the bridge must reconcile exactly by construction")
  }
}
