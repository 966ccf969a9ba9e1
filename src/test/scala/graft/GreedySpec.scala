package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the greedy-and-commutativity wave
  * (GreedyQueries, q389-q392): CDC order-independence, decomposition
  * residual bounds, a driver replay of the cooldown fold, and greedy
  * coverage monotonicity with diminishing returns.
  */
class GreedySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q389 CDC commutativity: zero mismatches between fold and direct resolution") {
    val Array(r) = run("q389_cdc_commutativity").collect()
    val (n, mism) = (r.getLong(0), r.getLong(1))
    assert(n > 0)
    assert(mism == 0, "LWW by version must be arrival-order independent")
  }

  test("q390 rate decomposition: residual bounded by segment count") {
    val Array(r) = run("q390_rate_decomposition").collect()
    val (nSeg, delta, mix, rate, cross, resid) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nSeg > 0)
    assert(resid == delta - (mix + rate + cross))
    // each of the 3 per-segment terms floors once at e6 (±1), plus the
    // two overall-rate floors — generous bound 4·segments + 4
    assert(math.abs(resid) <= 4 * nSeg + 4,
      s"rounding residual $resid must stay within the documented floor budget")
  }

  test("q391 cooldown: driver replay of the greedy fold matches") {
    import org.apache.spark.sql.functions._
    val Array(r) = run("q391_cooldown_suppression").collect()
    val (nUsers, totalAlerts, totalEmitted) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val alerts = Tables.events(spark, sf).filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byUser = alerts.groupBy(_._1)
    assert(nUsers == byUser.size)
    assert(totalAlerts == alerts.length)
    val expectEmitted = byUser.values.map { xs =>
      var last = 0L; var n = 0L
      xs.sortBy(x => (x._2, x._3)).foreach { case (_, us, _) =>
        if (us - last > 3600000000L) { last = us; n += 1 }
      }
      n
    }.sum
    assert(totalEmitted == expectEmitted, "greedy fold must match the sequential replay")
    assert(totalEmitted <= totalAlerts)
  }

  test("q392 greedy cover: coverage monotone, gains never increase") {
    val rows = run("q392_greedy_cover").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    // greedy gains are non-increasing (submodularity of coverage)
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "marginal coverage gains must be non-increasing")
    // cumulative coverage strictly grows while rounds continue
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    rows.foreach { case (_, _, gain, _, cov) => assert(gain > 0 && cov <= 10000) }
  }
}
