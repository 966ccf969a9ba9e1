package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the convergence wave (q492-q493): the L1
  * cost curve brute-forced, the AIMD fold replayed.
  */
class ConvergenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def dailyVols(): Seq[Long] = {
    import org.apache.spark.sql.functions._
    Tables.orders(spark, sf)
      .groupBy(expr("cast(o_orderdate as date)").as("d"))
      .agg(count(lit(1))).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).sorted.map(_._2).toSeq
  }

  test("q492 ternary search: brute force confirms the global minimum") {
    val vs = dailyVols()
    def f(x: Long): Long = vs.map(v => math.abs(x - v)).sum
    val brute = (vs.min to vs.max).map(x => (f(x), x)).min
    val Array(r) = run("q492_ternary_median").collect()
    assert(r.getLong(4) == brute._1, "ternary cost = brute-force minimum")
    assert(f(r.getLong(3)) == brute._1, "ternary argmin is a minimizer")
    val med = vs.sorted.apply(((vs.length + 1) / 2 - 1))
    assert(r.getLong(5) == med && r.getLong(6) == f(med))
    assert(r.getLong(7) == 1L && r.getLong(8) == 1L, "both certificates")
  }

  test("q493 AIMD: fold replayed, fairness gap never widens") {
    val caps = dailyVols()
    var w1 = 1L + math.floorMod(md5_60("flow1"), 8L)
    var w2 = 9L + math.floorMod(md5_60("flow2"), 8L)
    var (nloss, used, viol) = (0L, 0L, 0L)
    caps.foreach { cap =>
      val before = math.abs(w1 - w2)
      used += math.min(w1 + w2, cap)
      if (w1 + w2 <= cap) { w1 += 1; w2 += 1 }
      else { w1 = math.max(w1 / 2, 1L); w2 = math.max(w2 / 2, 1L); nloss += 1 }
      if (math.abs(w1 - w2) > before) viol += 1
    }
    val Array(r) = run("q493_aimd_fairness").collect()
    assert(r.getLong(4) == w1 && r.getLong(5) == w2, "final windows bit-equal")
    assert(r.getLong(6) == nloss, "loss days bit-equal")
    assert(r.getLong(8) == 0L && viol == 0L, "Chiu-Jain: gap never widens")
    assert(r.getLong(10) == used * 10000L / caps.sum, "utilization exact")
  }
}
