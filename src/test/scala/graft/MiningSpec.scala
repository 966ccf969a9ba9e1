package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the mining-and-fitting wave
  * (MiningQueries, q365-q368): recall bounds, Cramer residual
  * optimality vs the one-factor fit, noise-screen accounting, and
  * Apriori's monotonicity certificate.
  */
class MiningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q365 sign sketch: recall in [0,1], overlap <= 5, probes present") {
    val rows = run("q365_sign_sketch_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, overlap, recall) =>
      assert(overlap >= 0 && overlap <= 5)
      assert(recall == overlap * 10000 / 5)
    }
  }

  test("q366 Cramer OLS: normal equations reproduced in driver BigInt") {
    import org.apache.spark.sql.functions._
    val Array(r) = run("q366_cramer_ols").collect()
    val (n, b0, b1, b2, mae) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && mae >= 0)
    // replay the 3x3 Cramer solve exactly
    val d = Tables.orders(spark, sf)
      .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(x => (x.getInt(0).toLong, x.getLong(1)))
    val d0 = d.map(_._1).min
    val rowsD = d.map { case (dn, y) => (dn - d0, if (((dn % 7) + 7) % 7 >= 5) 1L else 0L, y) }
    def S(f: ((Long, Long, Long)) => BigInt): BigInt = rowsD.map(f).sum
    val (sn, st, sw) = (BigInt(rowsD.length), S(t => t._1), S(t => t._2))
    val (stt, stw, sww) = (S(t => BigInt(t._1) * t._1), S(t => BigInt(t._1) * t._2), S(t => BigInt(t._2) * t._2))
    val (sy, sty, swy) = (S(t => t._3), S(t => BigInt(t._1) * t._3), S(t => BigInt(t._2) * t._3))
    def det3(a: Seq[BigInt], b: Seq[BigInt], c: Seq[BigInt]): BigInt =
      a(0) * (b(1) * c(2) - b(2) * c(1)) - a(1) * (b(0) * c(2) - b(2) * c(0)) +
        a(2) * (b(0) * c(1) - b(1) * c(0))
    val da = det3(Seq(sn, st, sw), Seq(st, stt, stw), Seq(sw, stw, sww))
    val e6 = BigInt(1000000)
    // Spark `div` and DuckDB `//` both truncate toward zero — BigInt's /
    def fdiv(a: BigInt, b: BigInt): BigInt = a / b
    assert(fdiv(det3(Seq(sy, st, sw), Seq(sty, stt, stw), Seq(swy, stw, sww)) * e6, da) == BigInt(b0))
    assert(fdiv(det3(Seq(sn, sy, sw), Seq(st, sty, stw), Seq(sw, swy, sww)) * e6, da) == BigInt(b1))
    assert(fdiv(det3(Seq(sn, st, sy), Seq(st, stt, sty), Seq(sw, stw, swy)) * e6, da) == BigInt(b2))
  }

  test("q367 noise screen: candidates bounded by rows, shares recompute") {
    val rows = run("q367_label_noise_screen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, cand, top, share) =>
      assert(cand >= 0 && cand <= n)
      assert(share == cand * 10000 / n)
      if (cand == 0) assert(top == -1L, "no candidates => no confused-into label")
    }
  }

  test("q368 Apriori: every triple's sub-pairs are at least as frequent") {
    val rows = run("q368_apriori_triples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (pa, pb, pc, s3, ab, ac, bc) =>
      assert(pa < pb && pb < pc, "canonical item order")
      assert(s3 >= 1)
      assert(ab >= s3 && ac >= s3 && bc >= s3,
        "Apriori monotonicity: subset support >= superset support")
    }
    // descending support order
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
