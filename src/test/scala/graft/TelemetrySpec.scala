package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the telemetry/queueing wave (q429-q432):
  * Lindley max-plus certificate + full driver replay, Little's law
  * exact identity, burn-rate alert policy shape, Gorilla bit
  * accounting.
  */
class TelemetrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** First 60 bits of md5 — the driver-side twin of the md5_60 kernel. */
  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q429 Lindley: max-plus certificate holds, driver replay agrees") {
    val Array(r) = run("q429_lindley_queue").collect()
    assert(r.getLong(7) == 0L, "recurrence == max-plus closed form, per event")
    assert(r.getLong(2) <= r.getLong(0), "waited <= events")
    val util = r.getLong(6)
    assert(util > 0 && util < 10000, s"utilization in (0,1): $util")

    // full driver replay: every user's Lindley recurrence from raw rows
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    var sumW, nEv = 0L
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(x => (x._2, x._3))
      var (a, s, w) = (0L, 0L, 0L)
      sorted.zipWithIndex.foreach { case ((_, us, eid), i) =>
        val svc = (3600L + java.lang.Math.floorMod(
          md5_60(s"$u:$us:$eid"), 28800L)) * 1000000L
        w = if (i == 0) 0L else math.max(0L, w + s - (us - a))
        sumW += w; a = us; s = svc; nEv += 1
      }
    }
    assert(r.getLong(0) == nEv, "event count")
    assert(r.getLong(3) == sumW / 1000000L, "total wait seconds, replayed")
    assert(r.getLong(5) == sumW / (nEv * 1000L), "mean wait ms, replayed")
  }

  test("q430 Little's law: the day-integral equals the duration sum") {
    val Array(r) = run("q430_littles_law").collect()
    assert(r.getLong(5) == 1L, "area == sum of durations (the law, exactly)")
    assert(r.getLong(3) == r.getLong(4))
    assert(r.getLong(9) >= 1L && r.getLong(9) <= r.getLong(0),
      "peak concurrency in [1, n_orders]")
    assert(r.getLong(1) >= 0L)
    // L = lambda * W in exact rationals: area/T = (N/T) * (area/N)
    // follows from the identity; spot the e6 projections are consistent
    // up to truncation: |l_e6 - lambda_e6*w_mean_e6/1e6| <= lambda+w+1
    val (l, lam, wm) = (r.getLong(6), r.getLong(7), r.getLong(8))
    val prod = (BigInt(lam) * BigInt(wm)) / BigInt(1000000)
    assert((BigInt(l) - prod).abs <= BigInt(lam / 1000 + wm / 1000 + 2),
      s"L ~= lambda*W at e6: $l vs $prod")
  }

  test("q431 burn rate: incidents page, quiet days don't, windows bound") {
    val rows = run("q431_burn_rate").collect()
    assert(rows.length >= 28, "one row per observed day")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "err <= n")
      assert(r.getLong(3) >= 0 && r.getLong(4) >= 0 && r.getLong(5) >= 0)
      // a page day must satisfy both window thresholds by construction
      if (r.getLong(6) == 1L)
        assert(r.getLong(3) >= 100000L && r.getLong(4) >= 50000L)
      if (r.getLong(7) == 1L)
        assert(r.getLong(4) >= 20000L && r.getLong(5) >= 10000L)
    }
    // injected incidents (40% error days) must actually page
    assert(rows.map(_.getLong(6)).sum >= 1L, "at least one page fired")
    assert(rows.map(_.getLong(7)).sum >= rows.map(_.getLong(6)).sum,
      "tickets at least as common as pages")
    // a quiet baseline day (1.5% errors) never pages
    rows.filter(_.getLong(3) < 100000L).foreach(r => assert(r.getLong(6) == 0L))
  }

  test("q432 Gorilla: bit accounting is closed and bounded") {
    val Array(r) = run("q432_gorilla_bits").collect()
    val (n, streams) = (r.getLong(0), r.getLong(1))
    assert(r.getLong(2) == n * 64, "raw is 64 bits/event")
    // bucket census covers exactly the dod-coded events
    val buckets = (5 to 9).map(r.getLong).sum
    assert(buckets == n - 2 * streams, "every i>=3 event in exactly one bucket")
    // coded sizes are within [1 bit/event, raw]
    assert(r.getLong(4) <= r.getLong(2) && r.getLong(4) >= n)
    assert(r.getLong(3) <= r.getLong(2) && r.getLong(3) >= n)
    assert(r.getLong(10) <= 10000L && r.getLong(11) <= 10000L)
  }
}
