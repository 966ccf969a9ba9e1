package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the availability wave (q501): draws
  * replayed, binomial theory re-derived, dominance exact.
  */
class AvailabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q501 commit availability: replayed, theory exact, dominance") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val nUp = ks.map(k => (1 to 5).count(r =>
      math.floorMod(md5_60(s"up:$k:$r"), 8L) != 0L).toLong)
    def c(n: Int, kk: Int): Long =
      if (kk < 0 || kk > n) 0L
      else (1 to kk).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    def theory(minUp: Int): Long =
      (minUp to 5).map(i => c(5, i) * math.pow(7, i).toLong).sum * 10000L / 32768L
    val rows = run("q501_commit_availability").collect()
    assert(rows.length == 3)
    val expect = Map("1_2pc_all5" -> (nUp.count(_ == 5L).toLong, theory(5)),
      "2_majority" -> (nUp.count(_ >= 3L).toLong, theory(3)),
      "3_any_replica" -> (nUp.count(_ >= 1L).toLong, theory(1)))
    rows.foreach { r =>
      val (avail, th) = expect(r.getString(0))
      assert(r.getLong(2) == avail, s"${r.getString(0)} replay bit-equal")
      assert(r.getLong(4) == th, "binomial theory re-derived")
      assert(r.getLong(6) == 1L, "dominance chain certified")
    }
    // the whole point: the consistency premium is an order of magnitude
    val m = rows.map(r => (r.getString(0), r.getLong(3))).toMap
    assert(m("1_2pc_all5") < m("2_majority"),
      "2PC strictly less available than majority at the same hardware")
  }
}
