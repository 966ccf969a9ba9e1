package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the decision-signal surface (SignalQueries,
  * q185-q189): the skyline equals the naive dominance filter, z²
  * recomputes in BigInt, drawdown recounts against a direct scan, BFS
  * layers partition reachable nodes, and the nearest join picks the
  * true minimum within tolerance.
  */
class SignalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q185 skyline: equals the naive O(n^2) dominance filter") {
    val got = run("q185_skyline").collect()
      .map(r => (r.getDouble(0), r.getAs[java.time.LocalDateTime](1))).toSet
    val pts = Tables.orders(spark, sf)
      .groupBy("o_totalprice").agg(max("o_orderdate").as("d"))
      .collect().map(r => (r.getDouble(0), r.getAs[java.time.LocalDateTime](1)))
    val naive = pts.filter { case (p, d) =>
      !pts.exists { case (p2, d2) =>
        p2 > p && !d2.isBefore(d)
      }
    }.toSet
    assert(got == naive, "partition-local + global staircase equals naive skyline")
    assert(got.nonEmpty)
  }

  test("q186 A/B z2: recomputes in BigInt from raw session counts") {
    val r = run("q186_ab_test_z2").collect()(0)
    val (na, ca, nb, cb, z2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val sessions = Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(2)))
    val a = sessions.filter(_._1 == 0)
    val b = sessions.filter(_._1 == 1)
    assert(na == a.length.toLong && ca == a.map(_._2).sum)
    assert(nb == b.length.toLong && cb == b.map(_._2).sum)
    val (bn1, bc1, bn2, bc2) = (BigInt(na), BigInt(ca), BigInt(nb), BigInt(cb))
    val num = (bc1 * bn2 - bc2 * bn1).pow(2) * (bn1 + bn2) * 1000000
    val den = bn1 * bn2 * (bc1 + bc2) * (bn1 + bn2 - bc1 - bc2)
    val expect = if (den == 0) BigInt(0) else num / den
    assert(BigInt(z2) == expect)
  }

  test("q187 max drawdown: nonnegative, bounded by peak, trough day recounts") {
    val rows = run("q187_max_drawdown").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDate(3)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("v6"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    rows.foreach { case (t, peak, dd, trough) =>
      val series = daily.filter(_._1 == t).sortBy(_._2.toEpochDay)
      assert(peak == series.map(_._3).max)
      var runPeak = Long.MinValue
      var best = Long.MinValue
      var bestDay: java.time.LocalDate = null
      series.foreach { case (_, day, v) =>
        runPeak = math.max(runPeak, v)
        val d = runPeak - v
        if (d > best) { best = d; bestDay = day }
      }
      assert(dd == best, s"$t drawdown")
      assert(trough.toLocalDate == bestDay, s"$t trough day (earliest max)")
      assert(dd >= 0)
    }
  }

  test("q188 BFS layers: disjoint, each layer reachable from the previous") {
    val rows = run("q188_bfs_layers").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(0L, 1L, 2L, 3L))
    assert(rows.head._2 == 1, "layer 0 is the single seed")
    // recompute layers driver-side from the pair table
    val edges = FeatureQueries.dupPairsTable(spark, sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val seed = edges.map(_._1).min
    var visited = Set(seed)
    var frontier = Set(seed)
    val expect = scala.collection.mutable.ArrayBuffer(1L)
    (1 to 3).foreach { _ =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
      visited ++= frontier
      expect += frontier.size.toLong
    }
    assert(rows.map(_._2).toSeq == expect.toSeq)
  }

  test("q189 nearest join: each match is the true minimum within tolerance") {
    val rows = run("q189_nearest_event_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = e.filter(_._3 == "purchase")
    val clicks = e.filter(_._3 == "click")
    val expect = purchases.flatMap { case (pid, u, _, pus) =>
      val cands = clicks.filter(c => c._2 == u && math.abs(c._4 - pus) <= 600000000L)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (math.abs(c._4 - pus), c._4, c._1))
        Some((pid, best._1, math.abs(best._4 - pus)))
      }
    }.toSet
    assert(rows.toSet == expect, "bucketed candidate join finds exactly the naive nearest")
    assert(rows.nonEmpty)
  }
}
