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
}
