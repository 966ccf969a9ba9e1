package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the Nim wave (q512): the retrograde DP
  * replayed in the driver, Bouton certified a third way.
  */
class NimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q512 Nim: driver retrograde DP agrees with XOR on all states") {
    val w = new Array[Boolean](1331)
    for (i <- 0 until 1331) {
      val (a, b, c) = (i / 121, (i / 11) % 11, i % 11)
      w(i) = (0 until a).exists(m => !w(m * 121 + b * 11 + c)) ||
        (0 until b).exists(m => !w(a * 121 + m * 11 + c)) ||
        (0 until c).exists(m => !w(a * 121 + b * 11 + m))
    }
    for (i <- 0 until 1331) {
      val (a, b, c) = (i / 121, (i / 11) % 11, i % 11)
      assert(w(i) == ((a ^ b ^ c) != 0), s"Bouton at ($a,$b,$c)")
    }
    assert(w.count(!_) == 91, "exactly 91 P-positions with piles <= 10")
    val Array(r) = run("q512_nim_bouton").collect()
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L, "engine proof clean")
    assert(r.getLong(3) == 91L && r.getLong(4) == 1L)
    assert(r.getLong(6) <= r.getLong(5), "P-positions within games")
  }
}
