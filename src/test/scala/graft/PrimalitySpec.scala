package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the primality wave (q497): both
  * classifiers replayed in the driver with independent arithmetic.
  */
class PrimalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q497 Miller-Rabin: verdicts replayed, theorem at 100%") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    def mrPrime(m: Long): Boolean = {
      var (s2, dd) = (0L, m - 1)
      while (dd % 2 == 0) { dd /= 2; s2 += 1 }
      Seq(2L, 3L).forall { a =>
        var x = 1L
        // identical 20-step left-to-right square-and-multiply
        (0 to 19).foreach { z =>
          x = (x * x) % m
          if ((dd >> (19 - z)) % 2 == 1) x = (x * a) % m
        }
        if (x == 1L || x == m - 1) true
        else (1L until s2).exists { _ => x = (x * x) % m; x == m - 1 }
      }
    }
    def truthPrime(m: Long): Boolean =
      !(3L to 999L by 2).exists(d => d * d <= m && m % d == 0)
    var (nPrime, nAgree) = (0L, 0L)
    ks.foreach { k =>
      val m = 5L + 2L * math.floorMod(md5_60(s"mr:$k"), 500000L)
      val (mr, tr) = (mrPrime(m), truthPrime(m))
      assert(mr == tr, s"m=$m: MR{2,3} must equal trial division below 1.37M")
      if (tr) nPrime += 1
      nAgree += 1
    }
    val Array(r) = run("q497_miller_rabin").collect()
    assert(r.getLong(0) == ks.length.toLong)
    assert(r.getLong(1) == nPrime && r.getLong(2) == nPrime,
      "prime counts bit-equal to the replay")
    assert(r.getLong(3) == ks.length.toLong, "agreement on every key")
  }
}
