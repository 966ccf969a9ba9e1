package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay spec for q561 Bradley–Terry (r12 verdict #4: the wave shipped
  * spec-less). Rebuilds the duel table, the 12-row win matrix, and the
  * five MM iterations in BigInt from the raw tables and demands the
  * engine's strengths bit-equal — a perturbed duel rule, win count,
  * normalization, or iteration count fails here.
  */
class SelectionOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q561 Bradley-Terry: duels, win matrix and 5 MM steps replayed") {
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
    val mx = nd.map(_._2).max
    val (c1, c2) = (mx - 56, mx - 28)
    val arms = Seq("weekday", "level", "ensemble", "naive7")
    // duel errors per test day, per the query's forecaster definitions
    val duels = nd.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val fit = rows.filter(_._2 <= c1)
      val valW = rows.filter(r => r._2 > c1 && r._2 <= c2)
      if (fit.isEmpty || valW.isEmpty) Nil else {
        val fDow = fit.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> rs.map(r => BigInt(r._3)).sum / rs.length }
        val fb = fit.map(r => BigInt(r._3)).sum / fit.length
        def fa(dn: Long): BigInt = fDow.getOrElse(((dn % 7) + 7) % 7, fb)
        val maeA = valW.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / valW.length
        val maeB = valW.map(r => (BigInt(r._3) - fb).abs).sum / valW.length
        val wA = if (maeA + maeB == 0) BigInt(500000)
          else maeB * 1000000 / (maeA + maeB)
        val sorted = rows.sortBy(_._2)
        sorted.filter(_._2 > c2).flatMap { case (_, dn, y) =>
          // seasonal-naive arm: most recent observation >= 7 days back
          val prior = sorted.filter(_._2 <= dn - 7)
          if (prior.isEmpty) None else {
            val y7 = BigInt(prior.last._3)
            val fe = (wA * fa(dn) + (BigInt(1000000) - wA) * fb) / 1000000
            Some(Map(
              "weekday" -> (BigInt(y) - fa(dn)).abs,
              "level" -> (BigInt(y) - fb).abs,
              "ensemble" -> (BigInt(y) - fe).abs,
              "naive7" -> (BigInt(y) - y7).abs))
          }
        }
      }
    }
    // win matrix over unordered pairs, then its symmetric closure
    val pairs = arms.combinations(2).map { case Seq(i, j) =>
      val wi = duels.count(d => d(i) < d(j)).toLong
      val wj = duels.count(d => d(j) < d(i)).toLong
      (i, j, wi, wj)
    }.toSeq
    val mat = pairs.flatMap { case (i, j, wi, wj) =>
      Seq((i, j, wi, wi + wj), (j, i, wj, wi + wj)) }
    val wins = arms.map(a => a -> (
      mat.filter(_._1 == a).map(_._3).sum,
      mat.filter(_._1 == a).map(_._4).sum)).toMap
    // 5 MM iterations in e6, renormalized to 4e6 each step
    var pi = arms.map(a => a -> BigInt(1000000)).toMap
    for (_ <- 1 to 5) {
      val raw = arms.map { a =>
        val den = mat.filter(_._1 == a).map { case (_, j, _, nij) =>
          BigInt(nij) * BigInt("1000000000000") / (pi(a) + pi(j)) }.sum
        a -> BigInt(wins(a)._1) * BigInt("1000000000000") / den.max(BigInt(1))
      }.toMap
      val tot = raw.values.sum
      pi = raw.map { case (a, v) => a -> v * 4000000 / tot }
    }
    val rankWant = arms.sortBy(a => (-pi(a), a)).zipWithIndex
      .map { case (a, i) => a -> (i + 1).toLong }.toMap
    val got = run("q561_bradley_terry").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == arms.toSet)
    arms.foreach { a =>
      val (gw, gn, gs, gr) = got(a)
      assert(gw == wins(a)._1 && gn == wins(a)._2,
        s"$a: win matrix replay (${wins(a)}) vs query ($gw,$gn)")
      assert(gs == pi(a).toLong, s"$a: MM strength ${pi(a)} vs $gs")
      assert(gr == rankWant(a), s"$a: rank")
    }
    // strengths renormalize to ~4e6 (floor loss < |arms|)
    val s = arms.map(a => pi(a)).sum
    assert(s > 4000000 - 4 && s <= 4000000)
  }

  test("q558 WRMSSE: naive-1 scale, pinned-op-order RMSSE and revenue " +
    "weights replayed") {
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
    val cut = nd.map(_._2).max - 28
    val revAll = nd.filter(r => r._2 <= cut && r._2 > cut - 28)
      .map(r => BigInt(r._3)).sum
    val want = nd.groupBy(_._1).flatMap { case (g, rows) =>
      val fit = rows.filter(_._2 <= cut).sortBy(_._2)
      val test = rows.filter(_._2 > cut)
      val wrev = fit.filter(_._2 > cut - 28).map(r => BigInt(r._3)).sum
      if (fit.length < 2 || test.isEmpty ||
        fit.forall(_._2 <= cut - 28)) None else {
        val fDow = fit.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> rs.map(r => BigInt(r._3)).sum / rs.length }
        val fb = fit.map(r => BigInt(r._3)).sum / fit.length
        def fa(dn: Long): BigInt = fDow.getOrElse(((dn % 7) + 7) % 7, fb)
        val ssd = fit.zip(fit.tail)
          .map { case (a, b) => BigInt(b._3 - a._3) * (b._3 - a._3) }.sum
        val nDiffs = (fit.length - 1).toLong
        val sse = test.map { r =>
          val e = BigInt(r._3) - fa(r._2); e * e }.sum
        val rmsse = math.round(math.sqrt(
          sse.toDouble * nDiffs / ssd.max(BigInt(1)).toDouble / test.length)
          * 1000000)
        val wE6 = (wrev * 1000000 / revAll).toLong
        Some(g -> (test.length.toLong, rmsse, wE6, wE6 * rmsse / 1000000))
      }
    }
    val got = run("q558_wrmsse").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == want.keySet, "same nation set")
    want.foreach { case (g, w) =>
      assert(got(g) == w, s"nation $g: replay $w vs query ${got(g)}") }
  }

  test("q559 purged K-fold: blocks, embargo purge and min-gap audit " +
    "replayed; no train day inside any embargo") {
    import spark.implicits._
    val days = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "cast(datediff(to_date(o_orderdate), date '1970-01-01') as bigint)"))
      .as[Long].collect().distinct.sorted
    val (d0, d1) = (days.min, days.max)
    val fold = days.map(dn => dn -> math.min(4L, (dn - d0) * 5 / (d1 - d0 + 1))).toMap
    val blocks = days.groupBy(fold).map { case (f, ds) =>
      f -> (ds.min, ds.max, ds.length.toLong) }
    val want = blocks.map { case (f, (lo, hi, nTest)) =>
      val others = days.filter(dn => fold(dn) != f)
      val purged = others.filter(dn => dn >= lo - 5 && dn <= hi + 5)
      val train = others.filterNot(dn => dn >= lo - 5 && dn <= hi + 5)
      val minGap = train.map(dn => if (dn < lo) lo - dn else dn - hi).min
      f -> (lo, hi, nTest, train.length.toLong, purged.length.toLong, minGap)
    }
    val got = run("q559_purged_cv").collect().map { r =>
      def l(i: Int) = r.get(i).asInstanceOf[Number].longValue
      l(0) -> (l(1), l(2), l(3), l(4), l(5), l(6))
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (f, w) =>
      assert(got(f) == w, s"fold $f: replay $w vs query ${got(f)}") }
    got.values.foreach { case (_, _, _, _, _, minGap) =>
      assert(minGap > 5, "every kept train day clears the 5-day embargo") }
  }

  test("q560 LOO source valuation: subtracted-count refits replayed") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id".cast("long"), $"source",
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(Long, String, String)].collect()
      .map { case (id, s, t) => (id, s, t.split("\\s+").toSeq) }
    val train = docs.filter(_._1 % 10 != 0)
    val held = docs.filter(_._1 % 10 == 0).flatMap(_._3)
    val c = train.flatMap(_._3).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val cs = train.groupBy(_._2).map { case (s, rows) =>
      s -> rows.flatMap(_._3).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong } }
    val nn = c.values.sum
    val vv = c.size.toLong
    val h = held.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def term(num: Long, den: Long): Long = {
      val sc = math.max(1L, num / 1000000L)
      val hi = num / sc
      val lo = math.max(1L, den / sc)
      // FixedLn replica, ladder 21
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
    val full = h.map { case (tok, hc) =>
      BigInt(hc) * term(nn + vv, c.getOrElse(tok, 0L) + 1) }.sum
    val want = cs.map { case (src, cm) =>
      val ns = cm.values.sum
      val loo = h.map { case (tok, hc) =>
        BigInt(hc) * term(nn - ns + vv,
          c.getOrElse(tok, 0L) - cm.getOrElse(tok, 0L) + 1) }.sum
      src -> (ns, full.toLong, loo.toLong, (loo - full).toLong)
    }
    val got = run("q560_loo_source_value").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (s, w) =>
      assert(got(s) == w, s"source $s: replay $w vs query ${got(s)}") }
  }
}
