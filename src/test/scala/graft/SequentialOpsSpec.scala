package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the sequential-monitoring/diversity wave (q565,
  * q566) — shipped spec-less in round 12 (r12 verdict #4). q565's
  * window-free CUSUM recursion and q566's unique-max clip rule are the
  * two pieces the oracle hash can't localize; both are replayed here.
  */
class SequentialOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Pure-Scala replica of the shared FixedLn kernel (ladder to 21). */
  private def lnE9(hi: Long, lo: Long): Long = {
    val r = hi * 1000000000L / lo
    val k = (21 to 1 by -1).find(kk => r >= (1L << kk) * 1000000000L).getOrElse(0)
    val r2 = r / (1L << k)
    val z = (r2 - 1000000000L) * 1000000000L / (r2 + 1000000000L)
    val z2 = z * z / 1000000000L
    val z3 = z * z2 / 1000000000L
    val z5 = z3 * z2 / 1000000000L
    val z7 = z5 * z2 / 1000000000L
    val z9 = z7 * z2 / 1000000000L
    val z11 = z9 * z2 / 1000000000L
    val z13 = z11 * z2 / 1000000000L
    k * 693147181L + 2 * (z + z3 / 3 + z5 / 5 + z7 / 7 + z9 / 9 + z11 / 11 + z13 / 13)
  }

  test("q565 CUSUM: the textbook max(0,...) recursion equals the " +
    "window prefix identity the query uses") {
    import spark.implicits._
    val nd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("g"),
        org.apache.spark.sql.functions.expr(
          "datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(round(o_totalprice * 100) as bigint))").as("y"))
      .as[(Long, Long, Long)].collect()
    val c1 = nd.map(_._2).max - 56
    val replay = nd.groupBy(_._1).flatMap { case (g, rows) =>
      val fit = rows.filter(_._2 <= c1)
      val mon = rows.filter(_._2 > c1).sortBy(_._2)
      if (fit.isEmpty || mon.isEmpty) None else {
        val fDow = fit.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> rs.map(r => BigInt(r._3)).sum / rs.length }
        val fb = fit.map(r => BigInt(r._3)).sum / fit.length
        def fa(dn: Long): BigInt = fDow.getOrElse(((dn % 7) + 7) % 7, fb)
        val mae = fit.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / fit.length
        val k = mae / 2
        val h = 4 * mae
        // the DIRECT recursion S_t = max(0, S_{t-1} + x_t - k)
        var (sp, sm) = (BigInt(0), BigInt(0))
        var (mp, mm) = (BigInt(0), BigInt(0))
        var alarms = 0L
        var first = -1L
        mon.foreach { case (_, dn, y) =>
          val e = BigInt(y) - fa(dn)
          sp = (sp + e - k).max(BigInt(0))
          sm = (sm - e - k).max(BigInt(0))
          mp = mp.max(sp); mm = mm.max(sm)
          if (sp > h || sm > h) { alarms += 1; if (first < 0) first = dn }
        }
        val verdict = if (alarms == 0) "in_control"
          else if (mp >= mm) "shift_up" else "shift_down"
        Some(g -> (mon.length.toLong, k.toLong, h.toLong, mp.toLong,
          mm.toLong, alarms, first, verdict))
      }
    }
    val got = run("q565_cusum").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (g, w) =>
      assert(got(g) == w, s"nation $g: direct recursion $w vs window ${got(g)}") }
  }

  test("q566 Self-BLEU: unique-max clip rule replayed per doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id".cast("long"),
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(String, Long, String)].collect()
      .map { case (l, id, t) => (l, id, t.split("\\s+").toSeq) }
    def gramCounts(n: Int): Map[(String, Long), Map[String, Long]] =
      docs.filter(_._3.length >= n).map { case (l, id, toks) =>
        (l, id) -> toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g2, xs) => g2 -> xs.length.toLong }
      }.toMap
    def precis(n: Int): Map[(String, Long), Long] = {
      val cnts = gramCounts(n)
      // per (lang, gram): top count, #docs at it, runner-up
      val census = cnts.toSeq
        .flatMap { case ((l, id), m) => m.map { case (g2, c) => (l, g2, c) } }
        .groupBy(t => (t._1, t._2))
        .map { case (k, xs) =>
          val m1 = xs.map(_._3).max
          val nmax = xs.count(_._3 == m1).toLong
          val m2 = xs.map(_._3).filter(_ < m1) match {
            case Nil => 0L; case s => s.max }
          k -> (m1, nmax, m2)
        }
      cnts.map { case ((l, id), m) =>
        val tot = m.values.sum
        val clipped = m.map { case (g2, c) =>
          val (m1, nmax, m2) = census((l, g2))
          val maxref = if (c == m1 && nmax == 1) m2 else m1
          math.min(c, maxref)
        }.sum
        (l, id) -> math.max(1L, clipped * 1000000L / tot)
      }
    }
    val (p2, p3) = (precis(2), precis(3))
    val keys = p2.keySet intersect p3.keySet
    val byLang = keys.groupBy(_._1).map { case (l, ks) =>
      val n = ks.size.toLong
      val s2 = ks.toSeq.map(p2).sum
      val s3 = ks.toSeq.map(p3).sum
      val nl = ks.toSeq.map(k =>
        (lnE9(1000000L, p2(k)) + lnE9(1000000L, p3(k))) / 2).sum
      l -> (n, s2 / n, s3 / n, nl / n)
    }
    val got = run("q566_self_bleu").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (l, w) =>
      assert(got(l) == w, s"lang $l: clip replay $w vs query ${got(l)}") }
    // the clip is live: some doc must be clipped below its own count
    // (otherwise every precision is 1e6 and the diversity score is 0)
    assert(got.values.exists(_._4 > 0L), "corpus shows non-zero diversity")
  }
}
