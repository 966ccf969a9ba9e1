package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the model-lifecycle flagships (q552, q553) — the
  * round-12 wave shipped spec-less (r12 verdict #4); these pin the
  * four-gate composition and the planted-clone certification so a
  * perturbation of any gate/threshold/drop rule fails here, not just
  * at the end-to-end oracle hash.
  */
class LifecycleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

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

  test("q552 retrain pipeline: all four gates replayed bit-equal in BigInt") {
    import spark.implicits._
    // order-grain base, re-derived exactly as the query's fixture scan
    val od = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("g"),
        org.apache.spark.sql.functions.expr(
          "datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"),
        org.apache.spark.sql.functions.expr(
          "cast(round(o_totalprice * 100) as bigint)").as("y"),
        $"o_orderkey".cast("long").as("ok"))
      .as[(Long, Long, Long, Long)].collect()
    val mx = od.map(_._2).max
    val (c1, c2) = (mx - 56, mx - 28)

    // — PSI gate (reference = dn <= c2, current = test window) —
    val psiByG = od.groupBy(_._1).flatMap { case (g, rows) =>
      val base = rows.filter(_._2 <= c2)
      val cur = rows.filter(_._2 > c2)
      if (base.isEmpty) None else {
        val ranked = base.sortBy(r => (r._3, r._4)).map(_._3)
        val n = ranked.length.toLong
        val edges = (1 to 9).map(i => (i * n + 9) / 10)
          .filter(tr => tr >= 1 && tr <= n).map(tr => ranked((tr - 1).toInt))
          .sorted
        def bins(ys: Seq[Long]): Map[Long, Long] =
          ys.groupBy(y => 1L + edges.count(_ < y))
            .map { case (b, g2) => b -> g2.length.toLong }
        val (bb, cb) = (bins(base.map(_._3)), bins(cur.map(_._3)))
        val allBins = (bb.keySet ++ cb.keySet).toSeq.sorted
        val (tp, tq) = (bb.values.sum, cb.values.sum)
        val nbins = allBins.length.toLong
        val psi = allBins.map { b =>
          val np = bb.getOrElse(b, 0L)
          val nq = cb.getOrElse(b, 0L)
          val p = math.max(1L, (np + 1) * 1000000L / (tp + nbins))
          val q = math.max(1L, (nq + 1) * 1000000L / (tq + nbins))
          math.abs(p - q) * lnE9(math.max(p, q), math.min(p, q))
        }.sum / 1000000L
        Some(g -> psi)
      }
    }

    // — shared forecasters on the day grain —
    val nd = od.groupBy(r => (r._1, r._2))
      .map { case ((g, dn), rows) => (g, dn, rows.map(_._3).sum) }.toSeq
    val byG = nd.groupBy(_._1)
    val replay = byG.flatMap { case (g, rows) =>
      val fit = rows.filter(_._2 <= c1)
      val valW = rows.filter(r => r._2 > c1 && r._2 <= c2)
      val test = rows.filter(_._2 > c2).sortBy(_._2)
      if (fit.isEmpty || test.isEmpty || valW.isEmpty) None else {
        val fDow = fit.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> rs.map(r => BigInt(r._3)).sum / rs.length }
        val fb = fit.map(r => BigInt(r._3)).sum / fit.length
        def fa(dn: Long): BigInt = fDow.getOrElse(((dn % 7) + 7) % 7, fb)
        // Trigg TS over the test window, final-day value
        var (ce, ca) = (BigInt(0), BigInt(0))
        test.foreach { case (_, dn, y) =>
          val e = BigInt(y) - fa(dn); ce += e; ca += e.abs }
        val ts = sdiv(ce * 1000000, ca.max(BigInt(1)))
        // inverse-MAE weights from validation
        val maeA = valW.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / valW.length
        val maeB = valW.map(r => (BigInt(r._3) - fb).abs).sum / valW.length
        val wA = if (maeA + maeB == 0) BigInt(500000)
          else maeB * 1000000 / (maeA + maeB)
        // three arms on test
        val mc = test.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / test.length
        val ml = test.map(r => (BigInt(r._3) - fb).abs).sum / test.length
        val me = test.map { r =>
          val fe = (wA * fa(r._2) + (BigInt(1000000) - wA) * fb) / 1000000
          (BigInt(r._3) - fe).abs }.sum / test.length
        val winner = if (mc <= me && mc <= ml) "champion"
          else if (me <= ml) "ensemble" else "level"
        val psi = psiByG(g)
        val drift = if (psi >= 100000000L) 1L else 0L
        val biased = if (ts.abs >= 500000) 1L else 0L
        val retrain = if (drift + biased > 0) 1L else 0L
        val action = if (retrain == 0) "keep"
          else if (winner == "champion") "refresh_champion"
          else s"promote_$winner"
        Some(g -> (psi, drift, ts.toLong, biased, test.length.toLong,
          wA.toLong, mc.toLong, ml.toLong, me.toLong, winner, retrain,
          action, 1L + retrain))
      }
    }
    val got = run("q552_retrain_pipeline").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
        r.getString(10), r.getLong(11), r.getString(12), r.getLong(13))).toMap
    assert(got.keySet == replay.keySet, "same nation set")
    replay.foreach { case (g, w) =>
      assert(got(g) == w, s"nation $g: replay $w vs query ${got(g)}") }
    // the composition is live: at least one gate value is non-trivial
    assert(got.nonEmpty)
  }

  test("q553 SemDeDup: exactly the planted mass is caught, checksums close") {
    import spark.implicits._
    val ids = Tables.embeddings(spark, sf).select($"vec_id".cast("long"))
      .as[Long].collect()
    val nPlantedWant = ids.count(_ % 25 == 0).toLong
    val rows = run("q553_semdedup").collect()
    rows.foreach { r =>
      val (cid, nm, np, nd, npd, nk, ratio, _) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))
      assert(npd == np, s"cell $cid: every planted clone dropped ($npd/$np)")
      assert(nd == np, s"cell $cid: NOTHING but planted dropped " +
        s"(natural ceiling cosine ~0.53 < tau): $nd vs $np")
      assert(nk == nm - nd && ratio == nd * 10000 / nm)
    }
    assert(rows.map(_.getLong(2)).sum == nPlantedWant,
      "total planted across cells == one clone per 25th vector")
    assert(rows.map(_.getLong(1)).sum == ids.length + nPlantedWant,
      "membership partitions the union corpus")
    // kept ids = all ids minus dropped clones; clones never survive, so
    // the checksum sum telescopes to the plain embedding-id sum
    assert(rows.map(_.getLong(7)).sum == ids.sum,
      "sum(keep_checksum) == sum(original vec_ids)")
  }
}
