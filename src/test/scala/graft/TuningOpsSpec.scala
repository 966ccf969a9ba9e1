package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the tuning/attribution wave (q567, q568) — both
  * queries changed in round 13 (q567's ratio-first overflow guard,
  * q568's shared decile fixture), so their math is pinned here.
  */
class TuningOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

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

  test("q567 JM bake-off: ratio-first p_e9 and per-lambda NLL replayed") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).filter($"lang" === "en")
      .select($"doc_id".cast("long"),
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").toSeq) }
      .filter(_._2.length >= 2)
    val bi = docs.flatMap { case (id, toks) =>
      toks.sliding(2).map(p => (id, p.head, p(1))).toSeq }
    val train = bi.filter(_._1 % 10 != 0)
    val held = bi.filter(_._1 % 10 == 0)
    val c12 = train.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.length.toLong }
    val c1 = train.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val c2 = train.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val nn = train.length.toLong
    val h = held.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.length.toLong }
    val lams = Seq(10L, 30L, 50L, 70L, 90L)
    val replay = lams.map { lam =>
      var (sumH, sumHl) = (0L, BigInt(0))
      h.foreach { case ((w1, w2), hc) =>
        val cc12 = c12.getOrElse((w1, w2), 0L)
        val cc1 = c1.getOrElse(w1, 0L)
        val cc2 = c2.getOrElse(w2, 0L)
        // the round-13 ratio-first order: each leg divides to e9
        // BEFORE the lambda weight (overflow-safe past c ~1e8)
        val ml = if (cc1 == 0) 0L else lam * (cc12 * 1000000000L / cc1) / 100
        val bo = (100 - lam) * (cc2 * 1000000000L / nn) / 100
        val p = math.max(1L, ml + bo)
        sumH += hc
        sumHl += BigInt(hc) * lnE9(1000000000L / math.max(1L, 1000000000L / 1000000L),
          math.max(1L, p / math.max(1L, 1000000000L / 1000000L)))
      }
      lam -> (sumH, (sumHl / sumH).toLong)
    }.toMap
    val best = replay.values.map(_._2).min
    val got = run("q567_jm_smoothing").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == lams.toSet)
    lams.foreach { lam =>
      val (nH, nll) = replay(lam)
      val (gn, gnll, gbest) = got(lam)
      assert(gn == nH && gnll == nll,
        s"lambda $lam: replay ($nH,$nll) vs query ($gn,$gnll)")
      assert(gbest == (if (nll == best) 1L else 0L))
    }
  }

  test("q568 PSI attribution: bins, terms and top-2 replayed; shares " +
    "sum to the nation PSI") {
    import spark.implicits._
    val od = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("g"),
        org.apache.spark.sql.functions.expr(
          "cast(datediff(to_date(o_orderdate), date '1970-01-01') as bigint)")
          .as("dn"),
        org.apache.spark.sql.functions.expr(
          "cast(round(o_totalprice * 100) as bigint)").as("y"),
        $"o_orderkey".cast("long").as("ok"))
      .as[(Long, Long, Long, Long)].collect()
    val mid = (od.map(_._2).min + od.map(_._2).max) / 2
    val want = od.groupBy(_._1).flatMap { case (g, rows) =>
      val base = rows.filter(_._2 <= mid)
      val cur = rows.filter(_._2 > mid)
      if (base.isEmpty) None else {
        val ranked = base.sortBy(r => (r._3, r._4)).map(_._3)
        val n = ranked.length.toLong
        val edges = (1 to 9).map(i => (i * n + 9) / 10)
          .map(tr => ranked((tr - 1).toInt)).sorted
        def bins(ys: Seq[Long]): Map[Long, Long] =
          ys.groupBy(y => 1L + edges.count(_ < y))
            .map { case (b, v) => b -> v.length.toLong }
        val (bb, cb) = (bins(base.map(_._3).toSeq), bins(cur.map(_._3).toSeq))
        val allBins = (bb.keySet ++ cb.keySet).toSeq.sorted
        val (tp, tq) = (bb.values.sum, cb.values.sum)
        val nbins = allBins.length.toLong
        val terms = allBins.map { b =>
          val np = bb.getOrElse(b, 0L)
          val nq = cb.getOrElse(b, 0L)
          val p = math.max(1L, (np + 1) * 1000000L / (tp + nbins))
          val q = math.max(1L, (nq + 1) * 1000000L / (tq + nbins))
          val t = math.abs(p - q) * lnE9(math.max(p, q), math.min(p, q)) / 1000000L
          (b, np, nq, t, if (q >= p) "inflow" else "outflow")
        }
        val psi = terms.map(_._4).sum
        val top2 = terms.sortBy(t => (-t._4, t._1)).take(2).zipWithIndex.map {
          case ((b, np, nq, t, dir), i) =>
            (g, (i + 1).toLong) -> (b, np, nq, t,
              t * 10000 / math.max(psi, 1L), dir)
        }
        top2
      }
    }
    val got = run("q568_psi_attribution").collect().map { r =>
      def l(i: Int) = r.get(i).asInstanceOf[Number].longValue
      (l(0), l(1)) -> (l(2), l(3), l(4), l(5), l(6), r.getString(7))
    }.toMap
    assert(got.keySet == want.keySet, "same (nation, rank) set")
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"$k: replay $w vs query ${got(k)}") }
  }
}
