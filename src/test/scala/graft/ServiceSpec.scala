package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the service surface (ServiceQueries,
  * q205-q209): the repair shipment matches the corruption rules, lagged
  * correlations are valid and complete, CF scores recount, DISC
  * percentiles are members while CONT interpolates, and dwell sessions
  * reconcile with q50's census.
  */
class ServiceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q205 repair shipment: totals equal the corruption rules; buckets are dirty ones") {
    val rows = run("q205_merkle_repair").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val marks = Tables.events(spark, sf)
      .select(col("event_id"),
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 97").as("m97"),
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 89").as("m89"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val missing = marks.count(_._2 == 0).toLong
    val stale = marks.count(m => m._2 != 0 && m._3 == 0).toLong
    assert(rows.map(_._2).sum == missing, "every dropped row shipped")
    assert(rows.map(_._3).sum == stale, "every perturbed row shipped")
    val dirty = run("q171_merkle_reconcile").collect()
      .filter(!_.getAs[Boolean]("in_sync")).map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet.subsetOf(dirty), "shipments only from diverging buckets")
  }

  test("q206 cross-correlation: five lags, r in [-1,1], lag-0 covers every shared day") {
    val rows = run("q206_cross_correlation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(-2L, -1L, 0L, 1L, 2L))
    rows.foreach { case (_, n, r) =>
      assert(n > 0)
      assert(r >= -1.0000001 && r <= 1.0000001)
    }
    val nDays = Tables.events(spark, sf).select(to_date(col("ts"))).distinct().count()
    assert(rows.find(_._1 == 0L).get._2 == nDays)
    // lag +k and -k align the same number of day pairs
    assert(rows.find(_._1 == 1L).get._2 == rows.find(_._1 == -1L).get._2)
    assert(rows.find(_._1 == 2L).get._2 == rows.find(_._1 == -2L).get._2)
  }

  test("q207 item CF: scores recount from the order baskets; no owned part emitted") {
    val rows = run("q207_item_cf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val items = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val target = items.map(i => (i._1, i._2)).distinct.groupBy(_._1).view
      .mapValues(_.size).toSeq.maxBy { case (c, n) => (n, -c) }._1
    val owned = items.filter(_._1 == target).map(_._3).toSet
    val baskets = items.map(i => (i._2, i._3)).distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (part, score, links) =>
      assert(!owned.contains(part), "recommendations exclude owned parts")
      val occs = baskets.values.toSeq.filter(_.contains(part))
        .map(b => b.intersect(owned).size)
      assert(score == occs.sum.toLong, s"part $part score")
      val distinctLinks = baskets.values.toSeq.filter(_.contains(part))
        .flatMap(_.intersect(owned)).toSet.size
      assert(links == distinctLinks.toLong, s"part $part links")
    }
  }

  test("q208 percentile bridge: DISC values are members, CONT within range") {
    val rows = run("q208_percentile_bridge").collect()
    assert(rows.nonEmpty)
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), expr("cast(round(value * 1000000) as bigint)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = vals.filter(_._1 == t).map(_._2).sorted
      val (p50d, p90d) = (r.getAs[Long]("p50_disc"), r.getAs[Long]("p90_disc"))
      assert(vs.contains(p50d) && vs.contains(p90d), s"$t DISC picks members")
      assert(p50d == vs((vs.length + 1) / 2 - 1), s"$t p50 ceil-rank")
      assert(p90d == vs((9 * vs.length + 9) / 10 - 1), s"$t p90 ceil-rank")
      val c50 = r.getAs[Double]("p50_cont")
      assert(c50 >= vs.head && c50 <= vs.last, s"$t CONT in range")
    }
  }

  test("q209 session dwell: session census reconciles with q50; dwell nonnegative") {
    val rows = run("q209_session_dwell").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalSessions = run("q50_sessionize")
      .agg(sum("n_sessions")).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == totalSessions, "every q50 session has exactly one entry type")
    rows.foreach { case (_, n, tot, mean, mx) =>
      assert(tot >= 0 && mx >= 0 && mean == tot / n)
      assert(mx * n >= tot)
    }
  }
}
