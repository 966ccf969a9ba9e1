package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the Euclid wave (q515-q516): both folds
  * replayed in the driver.
  */
class EuclidSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def keys(): Seq[Long] = {
    import org.apache.spark.sql.functions._
    Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0)).toSeq
  }

  test("q515 extended Euclid: Bezout and Lame replayed") {
    var (steps, coprime) = (0L, 0L)
    var stepsMax = 0L
    val ks = keys()
    ks.foreach { k =>
      val a = 1L + math.floorMod(md5_60(s"ga:$k"), 999999L)
      val b = 1L + math.floorMod(md5_60(s"gb:$k"), 999999L)
      var (r, r2, s0, s2, t0, t2, st) = (a, b, 1L, 0L, 0L, 1L, 0L)
      while (r2 != 0L) {
        val q = r / r2
        val nr2 = r - q * r2; r = r2; r2 = nr2
        val ns2 = s0 - q * s2; s0 = s2; s2 = ns2
        val nt2 = t0 - q * t2; t0 = t2; t2 = nt2
        st += 1
      }
      assert(a % r == 0 && b % r == 0, "divides both")
      assert(a * s0 + b * t0 == r, "Bezout identity exact")
      val nd = math.min(a, b).toString.length
      assert(st <= 5L * nd, "Lame bound")
      steps += st; stepsMax = math.max(stepsMax, st)
      if (r == 1L) coprime += 1
    }
    val Array(r) = run("q515_euclid_bezout").collect()
    assert(r.getLong(1) == ks.length.toLong && r.getLong(2) == ks.length.toLong
      && r.getLong(3) == ks.length.toLong, "all three certificates total")
    assert(r.getLong(4) == stepsMax, "max steps bit-equal")
    assert(r.getLong(6) == coprime, "coprime count bit-equal")
  }

  test("q516 Zeckendorf: greedy replayed, theorem clauses hold") {
    val fibs = {
      val b = scala.collection.mutable.ArrayBuffer(1L, 2L)
      while (b.last < 2000000L) b += b(b.size - 1) + b(b.size - 2)
      b.toSeq
    }
    var partsMax = 0L
    keys().foreach { k =>
      val n = 1L + math.floorMod(md5_60(s"zk:$k"), 1000000L)
      var rem = n
      val taken = fibs.reverse.map { f =>
        if (rem >= f) { rem -= f; 1L } else 0L
      }.reverse
      assert(taken.zip(fibs).map { case (t, f) => t * f }.sum == n, "sum back")
      assert(!taken.zip(taken.tail).exists { case (x, y) => x == 1L && y == 1L },
        "no adjacent Fibonacci parts")
      partsMax = math.max(partsMax, taken.sum)
    }
    val Array(r) = run("q516_zeckendorf").collect()
    assert(r.getLong(1) == r.getLong(0) && r.getLong(2) == r.getLong(0))
    assert(r.getLong(3) == 1L, "Zeckendorf certificate")
    assert(r.getLong(4) == partsMax, "max parts bit-equal")
  }
}
