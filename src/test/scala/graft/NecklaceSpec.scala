package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the necklace wave (q519): Burnside
  * replayed by enumeration AND by the gcd-power formula.
  */
class NecklaceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q519 Burnside: enumeration = formula for both bead counts") {
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    def canon(v: Int, n: Int): Int =
      (0 until n).map(r => (v >> r) | ((v & ((1 << r) - 1)) << (n - r)))
        .map(_ & ((1 << n) - 1)).min
    def classes(n: Int): Int =
      (0 until (1 << n)).map(canon(_, n)).distinct.size
    def burnside(n: Int): Int =
      (0 until n).map(k => 1 << gcd(k, n)).sum / n
    assert(classes(6) == 14 && burnside(6) == 14)
    assert(classes(7) == 20 && burnside(7) == 20)
    val Array(r) = run("q519_necklace_burnside").collect()
    assert(r.getLong(1) == 14L && r.getLong(2) == 1L)
    assert(r.getLong(4) == 20L && r.getLong(5) == 1L)
    assert(r.getLong(7) <= 20L && r.getLong(8) == 1L,
      "observed classes within the proven bound")
    assert(r.getLong(9) <= r.getLong(6))
  }
}
