package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the Basel wave (q520): the series replayed
  * exactly, the bracket arithmetic verified.
  */
class BaselSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q520 Basel + Cesaro: series bit-equal, bracket proven") {
    var f = 0L
    (1L to 100000L).foreach(n => f += 1000000000000L / (n * n))
    val pi2over6e12 = 1644934066848L
    assert(pi2over6e12 >= f + 9999900L && pi2over6e12 <= f + 100000L + 10000000L,
      "the exact bracket contains pi^2/6")
    val Array(r) = run("q520_basel_cesaro").collect()
    assert(r.getLong(0) == f, "floored Basel sum bit-equal")
    assert(r.getLong(1) == 1L, "bracket certificate")
    assert(math.abs(r.getLong(2) - 9869604L) < 100L,
      "series pi^2 within 1e-4 of the literal")
    assert(r.getLong(4) <= r.getLong(3))
    assert(r.getLong(9) == 1L, "Cesaro estimate within 5%")
  }
}
