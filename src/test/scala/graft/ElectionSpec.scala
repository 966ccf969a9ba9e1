package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the election-and-diffusion wave
  * (q499-q500): Chang-Roberts and the avalanche census replayed.
  */
class ElectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q499 Chang-Roberts: message count replayed, bounds hold") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0)).filter(k => math.floorMod(md5_60(s"rn:$k"), 14L) == 0L)
    var (msgsTot, nNodes, nRings) = (0L, 0L, 0L)
    ks.groupBy(k => math.floorMod(md5_60(s"ring:$k"), 32L)).foreach {
      case (_, xs) =>
        val ids = xs.map(k => (md5_60(s"pos:$k"), k, md5_60(s"id:$k")))
          .sortBy(t => (t._1, t._2)).map(_._3)
        val n = ids.length
        val msgs = (0 until n).map { i =>
          (1 until n).find(d => ids((i + d) % n) > ids(i))
            .map(_.toLong).getOrElse(n.toLong)
        }.sum
        assert(msgs >= 2L * n - 1 && msgs <= n.toLong * (n + 1) / 2, "bounds")
        msgsTot += msgs; nNodes += n; nRings += 1
    }
    val Array(r) = run("q499_ring_election").collect()
    assert(r.getLong(0) == nRings && r.getLong(1) == nNodes)
    assert(r.getLong(2) == msgsTot, "total messages bit-equal")
    assert(r.getLong(6) == 0L && r.getLong(7) == 0L, "zero bound violations")
  }

  test("q500 avalanche: distances replayed, diffusion near binomial") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val hds = ks.map(k => java.lang.Long.bitCount(
      md5_60(s"s:$k") ^ md5_60(s"S:$k")).toLong)
    val Array(r) = run("q500_avalanche").collect()
    assert(r.getLong(0) == ks.length.toLong)
    assert(r.getLong(1) == hds.sum * 10000L / ks.length, "mean bit-equal")
    assert(r.getLong(4) == hds.min && r.getLong(5) == hds.max)
    // diffusion: mean within 2% of 30, variance within 25% of 15
    assert(math.abs(r.getLong(1) - 300000L) <= 6000L, "mean near 30")
    assert(math.abs(r.getLong(3) - 10000L) <= 2500L, "variance near binomial")
  }
}
