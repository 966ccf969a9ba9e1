package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the profiling surface (ProfileQueries,
  * q215-q218): the sweep-line curve recounts, robust scaling centers
  * at the median, the leakage audit is bounded, and NDV correlation
  * obeys its algebraic bounds.
  */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q215 sweep concurrency: peak matches a driver-side interval recount") {
    val rows = run("q215_sweep_concurrency").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, peak, eom) => assert(peak >= eom && peak >= 0) }
    val spans = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("shipped"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey").as("l_orderkey"), to_date(col("o_orderdate")).as("opened")),
        Seq("l_orderkey"))
      .collect().map(r => (r.getDate(2).toLocalDate, r.getDate(1).toLocalDate))
    val globalPeak = rows.map(_._2).max
    // recount the global peak by sweeping the intervals driver-side
    val events = spans.flatMap { case (o, s) =>
      Seq((o, 1L), (s.plusDays(1), -1L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay)
    var open = 0L
    var best = 0L
    events.foreach { case (_, d) => open += d; best = math.max(best, open) }
    assert(globalPeak == best, "sweep-line peak equals the interval recount")
  }

  test("q216 robust scaling: full corpus emitted; median rows scale to zero") {
    val rows = run("q216_robust_scaling").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length.toLong == Tables.events(spark, sf).count())
    rows.groupBy(_._2).foreach { case (t, g) =>
      val vs = g.map(_._3).sorted
      val med = vs((vs.length + 1) / 2 - 1)
      val ads = g.map(x => math.abs(x._3 - med)).sorted
      val mad = ads((ads.length + 1) / 2 - 1)
      g.foreach { case (_, _, v, ro) =>
        val expect =
          if (mad == 0) 0L
          else if (v < med) -((med - v) * 10000 / mad)
          else (v - med) * 10000 / mad
        assert(ro == expect, s"$t value $v")
      }
      assert(g.filter(_._3 == med).forall(_._4 == 0L), s"$t median row scales to 0")
    }
  }

  test("q217 split leakage: overlap bounded; recounts per type") {
    val rows = run("q217_split_leakage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, tr, te, ov, leak) =>
      assert(ov <= math.min(tr, te))
      assert(leak == (if (te == 0) 0L else ov * 10000 / te))
    }
  }

  test("q218 NDV correlation: algebraic bounds hold; recounts") {
    val rows = run("q218_ndv_correlation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("event_type,day", "user_id,day"))
    rows.foreach { case (_, a, b, pair, ind) =>
      assert(pair >= math.max(a, b), "pair NDV at least each marginal")
      assert(pair <= a * b, "pair NDV at most the product")
      assert(ind == pair * 10000 / (a * b))
      assert(ind >= 0 && ind <= 10000)
    }
  }
}
