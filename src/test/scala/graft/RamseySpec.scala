package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the Ramsey wave (q511): the enumeration
  * replayed in the driver, Goodman's bound observed.
  */
class RamseySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q511 Ramsey: driver enumeration agrees, Goodman bound holds") {
    def escapees(n: Int): Int = {
      val ps = (for { i <- 0 until n; j <- i + 1 until n } yield (i, j))
        .zipWithIndex.toMap
      val tris = for { a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n }
        yield (ps((a, b)), ps((a, c)), ps((b, c)))
      (0 until (1 << ps.size)).count { v =>
        !tris.exists { case (e1, e2, e3) =>
          ((v >> e1) & 1) == ((v >> e2) & 1) &&
            ((v >> e2) & 1) == ((v >> e3) & 1)
        }
      }
    }
    assert(escapees(6) == 0, "K6: no triangle-free coloring exists")
    assert(escapees(5) == 12, "K5: exactly 12 escape")
    val Array(r) = run("q511_ramsey_33").collect()
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L, "upper bound proved")
    assert(r.getLong(4) == 12L && r.getLong(5) == 1L, "lower bound exact")
    assert(r.getLong(7) == r.getLong(6) && r.getLong(8) == 1L,
      "every real party of six exhibits a mono triangle")
    assert(r.getLong(9) >= 2L,
      "Goodman's theorem: K6 colorings carry at least TWO mono triangles")
  }
}
