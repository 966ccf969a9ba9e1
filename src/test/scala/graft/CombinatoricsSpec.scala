package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the combinatorics wave (q517-q518):
  * enumeration replayed, recurrence cross-checked.
  */
class CombinatoricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q517 ballot: driver enumeration confirms Catalan") {
    var (bal, dyck) = (0, 0)
    (0 until 65536).foreach { v =>
      var (p, mn) = (0, 0)
      (0 until 16).foreach { j =>
        p += (if (((v >> j) & 1) == 1) 1 else -1)
        mn = math.min(mn, p)
      }
      if (p == 0) { bal += 1; if (mn >= 0) dyck += 1 }
    }
    assert(bal == 12870 && dyck == 1430, "C(16,8) and Catalan C_8")
    val Array(r) = run("q517_ballot_catalan").collect()
    assert(r.getLong(1) == 12870L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 1430L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 1111L, "exact conditional probability 1/9")
    assert(r.getLong(8) <= r.getLong(7), "Dyck keys within balanced keys")
  }

  test("q518 derangements: subfactorial exact, census consistent") {
    var (d2, d1) = (1L, 0L)
    (2 to 8).foreach { k => val n = (k - 1) * (d1 + d2); d2 = d1; d1 = n }
    assert(d1 == 14833L, "D(8) by recurrence")
    // inclusion-exclusion closed form as a third derivation
    val fact = (1 to 8).foldLeft(1L)(_ * _)
    val ie = (0 to 8).map(k => (if (k % 2 == 0) 1L else -1L) *
      fact / (1 to k).foldLeft(1L)(_ * _)).sum
    assert(ie == 14833L, "D(8) by inclusion-exclusion")
    val Array(r) = run("q518_derangements").collect()
    assert(r.getLong(0) == 14833L && r.getLong(1) == 1L)
    assert(r.getLong(4) <= r.getLong(3), "derangements within groups")
    assert(r.getLong(6) >= 0L)
  }
}
