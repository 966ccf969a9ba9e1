package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the number-theoretic wave (q496): the
  * birthday census replayed in the driver.
  */
class NumberSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q496 birthday bound: collision census replayed") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val hs = ks.map(k => md5_60(s"bd:$k"))
    val rows = run("q496_birthday_bound").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 20L, 24L, 28L))
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      val counts = hs.groupBy(_ >> (60 - b)).values.map(_.size.toLong)
      assert(r.getLong(1) == ks.length.toLong && r.getLong(7) == 1L)
      assert(r.getLong(2) == counts.size.toLong, "buckets used bit-equal")
      assert(r.getLong(3) == counts.max, "max bucket bit-equal")
      assert(r.getLong(4) == counts.map(c => c * (c - 1) / 2).sum,
        "colliding pairs bit-equal")
      val n = ks.length.toLong
      assert(r.getLong(5) == n * (n - 1) / 2 * 10000L / (1L << b),
        "exact expectation")
    }
    // monotone: wider prefixes can only reduce collisions
    rows.map(_.getLong(4)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _           =>
    }
  }
}
