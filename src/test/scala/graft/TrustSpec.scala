package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the stewardship surface (TrustQueries,
  * q240-q243): tokenization is injective and coverage counts match a
  * direct computation, capping is monotone, Shapley shares satisfy
  * efficiency/symmetry bounds, and the rolling slope matches a
  * windowed recomputation.
  */
class TrustSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q240 pseudonymize: injective tokens; outside-dim equals non-purchaser events") {
    val Array(r) = run("q240_pseudonymize").collect()
    val (nEvents, nUsers, nTokens, nColl, nOutside) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nColl == 0 && nUsers == nTokens, "md5-16 injective on this id domain")
    val purchasers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").select("user_id").distinct()
    val direct = Tables.events(spark, sf)
      .join(purchasers, Seq("user_id"), "left_anti").count()
    assert(nOutside == direct, "token-level anti-join equals id-level anti-join")
    assert(nEvents == Tables.events(spark, sf).count())
  }

  test("q241 contribution cap: capped <= raw, retained in [0, 10000]") {
    val rows = run("q241_contribution_cap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nRaw, nCap, _, _, ret) =>
      assert(nCap <= nRaw)
      assert(ret >= 0 && ret <= 10000)
      assert(ret == nCap * 10000 / nRaw)
    }
    // capping at 20 keeps at most 20 per user overall
    val users = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => math.min(r.getLong(1), 20L)).sum
    assert(rows.map(_._3).sum == users, "total capped rows = sum of per-user minima")
  }

  test("q242 Shapley: efficiency identity and non-negativity for monotone v") {
    val Array(r) = run("q242_shapley_attribution").collect()
    val (pc, pv, pg, organic, total) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // efficiency: shares (in sixths) sum to 6 * (v(N) - v(empty))
    assert(pc + pv + pg == 6 * (total - organic), "Shapley efficiency")
    // v(S) monotone in S => all marginals >= 0
    assert(pc >= 0 && pv >= 0 && pg >= 0)
  }

  test("q243 rolling regression: matches a direct 14-cell OLS recomputation") {
    val got = run("q243_rolling_regression").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getLong(3))).toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      sorted.sliding(14).foreach { win =>
        if (win.length == 14) {
          val xs = win.map(_._2.toLocalDate.toEpochDay)
          val ys = win.map(_._3)
          val n = BigInt(14)
          val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
          val sxx = xs.map(x => BigInt(x) * x).sum
          val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
          val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
          val slope = if (num < 0) -((-num) / den) else num / den
          val key = (t, win.last._2.toString)
          assert(got.contains(key), s"missing $key")
          assert(BigInt(got(key)) == slope, s"$key slope")
        }
      }
    }
  }
}
