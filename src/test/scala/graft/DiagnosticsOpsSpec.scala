package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the diagnostics-ops wave (q546–q548). */
class DiagnosticsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(a: BigInt, b: BigInt): BigInt =
    if (a >= 0) a / b else -((-a) / b)

  private def dayGrain(): Array[(Long, Long, Long)] = {
    import spark.implicits._
    Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("g"),
        expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))").as("y"))
      .as[(Long, Long, Long)].collect()
  }

  test("q546 Ljung-Box replayed bit-equal; bounds and decision pinned") {
    val nd = dayGrain()
    val fit = nd.groupBy(r => (r._1, ((r._2 % 7) + 7) % 7))
      .map { case (k, rs) => k -> rs.map(_._3).sum / rs.length }
    val replay = nd.groupBy(_._1).map { case (g, rows) =>
      val es = rows.sortBy(_._2).map { case (_, dn, y) =>
        y - fit((g, ((dn % 7) + 7) % 7)) }
      val n = es.length
      val me = sdiv(BigInt(es.sum), n).toLong
      val ec = es.map(_ - me)
      val s0 = ec.map(e => BigInt(e) * e).sum.max(BigInt(1))
      val terms = (1 to 7).map { k =>
        val numk = (0 until n - k).map(t => BigInt(ec(t)) * ec(t + k)).sum
        val r6 = sdiv(numk * 1000000, s0).toLong
        (k.toLong, r6, (r6 * r6) / (n - k))
      }
      val q = BigInt(n) * (n + 2) * terms.map(_._3).sum / 1000000
      val worst = terms.minBy { case (k, r6, _) => (-math.abs(r6), k) }._1
      g -> (n.toLong, q.toLong, terms.map(t => math.abs(t._2)).max, worst,
        if (q.toLong < 14067140L) 1L else 0L)
    }
    val got = run("q546_ljung_box").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (g, v) =>
      assert(got(g) == v, s"nation $g: replay $v vs ${got(g)}") }
    got.values.foreach { case (_, q, maxr, wl, _) =>
      assert(q >= 0 && maxr <= 1000000L && wl >= 1 && wl <= 7)
    }
  }

  test("q547 churn: flows conserve, counts partition the corpus") {
    val rows = run("q547_ivf_churn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == nVec, "before-cells partition the corpus")
    assert(rows.map(_._4).sum == nVec, "after-cells partition the corpus")
    assert(rows.map(_._3).sum == rows.map(_._5).sum,
      "every mover leaves one cell and enters another")
    rows.foreach { case (cell, nb, out, na, in, churn) =>
      assert(cell >= 0 && cell <= 7)
      assert(out <= nb, "cannot lose more than you had")
      assert(na == nb - out + in, "flow conservation per cell")
      assert(churn == out * 10000 / math.max(nb, 1))
    }
  }

  test("q548 Diebold-Mariano replayed; decision fields consistent") {
    val nd = dayGrain()
    val cut = nd.map(_._2).max - 28
    val train = nd.filter(_._2 <= cut)
    val fd = train.groupBy(r => (r._1, ((r._2 % 7) + 7) % 7))
      .map { case (k, rs) => k -> rs.map(_._3).sum / rs.length }
    val fa = train.groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._3).sum / rs.length }
    val replay = nd.filter(_._2 > cut).groupBy(_._1).map { case (g, rows) =>
      val ds = rows.map { case (_, dn, y) =>
        val f1 = fd.getOrElse((g, ((dn % 7) + 7) % 7), fa(g))
        math.abs(y - f1) - math.abs(y - fa(g))
      }
      val n = ds.length
      val sd = BigInt(ds.sum)
      val sdd = ds.map(d => BigInt(d) * d).sum
      val dm2 = sdiv(BigInt(n - 1) * sd * sd * 1000000,
        (BigInt(n) * sdd - sd * sd).max(BigInt(1))).toLong
      g -> (n.toLong, sdiv(sd, n).toLong, dm2,
        if (sd < 0) "dow_mean" else if (sd > 0) "global_mean" else "tie",
        if (dm2 >= 3841459L) 1L else 0L)
    }
    val got = run("q548_diebold_mariano").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (g, v) =>
      assert(got(g) == v, s"nation $g: replay $v vs ${got(g)}") }
    got.values.foreach { case (_, _, dm2, _, _) =>
      assert(dm2 >= 0, "a squared statistic is non-negative") }
  }
}
