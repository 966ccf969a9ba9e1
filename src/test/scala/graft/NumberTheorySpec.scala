package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the number-theory wave (q513-q514):
  * Fermat vs MR cross-check, twin census replayed.
  */
class NumberTheorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def candidates(): Seq[Long] = {
    import org.apache.spark.sql.functions._
    Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(r => 5L + 2L * math.floorMod(md5_60(s"mr:${r.getLong(0)}"), 500000L))
      .toSeq
  }

  private def isPrime(m: Long): Boolean =
    !(3L to 999L by 2).exists(d => d * d <= m && m % d == 0)

  test("q513 Fermat: FLT certificate holds, pseudoprimes are composite") {
    def fermatPass(m: Long): Boolean = {
      var x = 1L
      (0 to 19).foreach { z =>
        x = (x * x) % m
        if (((m - 1) >> (19 - z)) % 2 == 1) x = (x * 2) % m
      }
      x == 1L
    }
    val ms = candidates()
    val pseudo = ms.filter(m => !isPrime(m) && fermatPass(m))
    ms.filter(isPrime).foreach(m =>
      assert(fermatPass(m), s"FLT must hold at prime $m"))
    val Array(r) = run("q513_fermat_pseudoprimes").collect()
    assert(r.getLong(1) == ms.count(isPrime).toLong)
    assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L,
      "every prime passes Fermat")
    assert(r.getLong(4) == pseudo.length.toLong, "pseudoprime count")
    pseudo.foreach(m => assert(!isPrime(m)))
    // MR (q497) is strictly stronger: it rejects every pseudoprime here
    val Array(mr) = run("q497_miller_rabin").collect()
    assert(mr.getLong(3) == mr.getLong(0), "MR stays exact on the same set")
  }

  test("q514 twins: census replayed") {
    val ms = candidates()
    val twins = ms.count(m => isPrime(m) && isPrime(m + 2)).toLong
    val Array(r) = run("q514_twin_primes").collect()
    assert(r.getLong(0) == ms.length.toLong)
    assert(r.getLong(2) == twins, "twin count bit-equal")
    assert(r.getLong(2) <= r.getLong(1), "twins are primes")
    assert(r.getLong(4) > 0L, "Hardy-Littlewood expectation present")
  }
}
