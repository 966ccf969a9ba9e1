package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the Kaprekar wave (q521): the exhaustion
  * replayed in the driver with a literal digit sort.
  */
class KaprekarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q521 Kaprekar: driver exhaustion confirms 6174 within 7") {
    def step(v: Int): Int = {
      val ds = f"$v%04d".map(_ - '0').sorted
      val asc = ds.foldLeft(0)((a, d) => a * 10 + d)
      val desc = ds.reverse.foldLeft(0)((a, d) => a * 10 + d)
      desc - asc
    }
    var (worst, n7) = (0, 0)
    (0 until 10000).foreach { v =>
      val ds = f"$v%04d"
      if (!ds.forall(_ == ds.head)) {
        var (x, steps) = (v, 0)
        while (x != 6174 && steps <= 8) { x = step(x); steps += 1 }
        assert(x == 6174 && steps <= 7, s"start $v converges within 7")
        worst = math.max(worst, steps)
        if (steps == 7) n7 += 1
      }
    }
    assert(worst == 7, "the worst case is exactly 7")
    assert(step(6174) == 6174, "fixed point")
    val Array(r) = run("q521_kaprekar").collect()
    assert(r.getLong(2) == 9990L && r.getLong(3) == 1L, "proved in-engine")
    assert(r.getLong(4) == 7L && r.getLong(5) == 1L)
    assert(r.getLong(6) == n7.toLong, "worst-case start count bit-equal")
    assert(r.getLong(7) == 1L && r.getLong(10) == 1L)
  }
}
