package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the folklore wave (q509-q510): both
  * recursions replayed in the driver.
  */
class FolkloreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q509 Josephus: recurrence equals closed form on every size") {
    // independent third derivation: direct elimination simulation
    def simulate(n: Int): Long = {
      val ring = scala.collection.mutable.ArrayBuffer.range(0, n)
      var idx = 0
      while (ring.length > 1) {
        idx = (idx + 1) % ring.length
        ring.remove(idx)
      }
      ring.head.toLong
    }
    (1 to 40).foreach { n =>
      var j = 0L
      (2 to n).foreach(m => j = (j + 2) % m)
      assert(j == simulate(n), s"recurrence = simulation at n=$n")
      val p2 = (9 to 0 by -1).map(1L << _).find(_ <= n).get
      assert(j == 2L * (n - p2), s"closed form at n=$n")
    }
    val Array(r) = run("q509_josephus").collect()
    assert(r.getLong(2) == r.getLong(0) && r.getLong(3) == 1L)
  }

  test("q510 Collatz: trajectories replayed, all reach one") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
      .filter(k => math.floorMod(md5_60(s"cz:$k"), 14L) == 0L)
    var (stepsTot, stepsMax, peakMax) = (0L, 0L, 0L)
    ks.foreach { k =>
      var x = 1L + 2L * math.floorMod(md5_60(s"cv:$k"), 500000L)
      var (st, pk) = (0L, x)
      while (x != 1L && st < 600L) {
        x = if (x % 2 == 0) x / 2 else 3 * x + 1
        st += 1; pk = math.max(pk, x)
      }
      assert(x == 1L, s"key $k trajectory reaches 1")
      stepsTot += st; stepsMax = math.max(stepsMax, st)
      peakMax = math.max(peakMax, pk)
    }
    val Array(r) = run("q510_collatz").collect()
    assert(r.getLong(0) == ks.length.toLong && r.getLong(2) == 1L)
    assert(r.getLong(3) == stepsMax, "max stopping time bit-equal")
    assert(r.getLong(4) == stepsTot * 100L / ks.length, "mean bit-equal")
    assert(r.getLong(5) == peakMax, "peak excursion bit-equal")
    assert(r.getLong(6) == ks.length.toLong, "no overflow risk")
  }
}
