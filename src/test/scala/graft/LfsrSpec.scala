package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the LFSR wave (q508): one full orbit
  * replayed imperatively, the Lagrange shortcut validated against it.
  */
class LfsrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q508 jump-ahead matrix powers match imperative stepping") {
    // the query's M^k literals are only trustworthy if they agree with
    // the actual generator — replay k steps imperatively per (k, seed)
    def step(x: Long): Long = (x / 2) ^ ((x % 2) * 46080L)
    for (k <- Seq(255L, 3855L, 13107L, 21845L, 65535L);
         seed <- Seq(1L, 0xACE1L, 12345L, 65534L)) {
      var x = seed; var i = 0L
      while (i < k) { x = step(x); i += 1 }
      val m = LfsrQueries.matPowFor(k)
      val jumped = (0 until 16).foldLeft(0L)((acc, b) =>
        if (((seed >> b) & 1L) == 1L) acc ^ m(b) else acc)
      assert(jumped == x, s"M^$k applied to seed=$seed")
    }
  }

  test("q508 LFSR: full orbit replay confirms the divisor shortcut") {
    def step(x: Long): Long = (x / 2) ^ ((x % 2) * 46080L)
    // one seed, full orbit: period is exactly 65535 and hits every
    // nonzero 16-bit state exactly once (the maximal-LFSR promise)
    val seen = new java.util.BitSet(65536)
    var x = 1L
    var period = 0L
    do {
      assert(!seen.get(x.toInt), "no state revisited before the seed")
      seen.set(x.toInt)
      x = step(x); period += 1
    } while (x != 1L && period <= 65536L)
    assert(period == 65535L, "full orbit length")
    assert(seen.cardinality() == 65535, "every nonzero state visited once")
    val Array(r) = run("q508_lfsr_period").collect()
    assert(r.getLong(0) >= 1L, "seeds sampled")
    assert(r.getLong(1) == r.getLong(0), "all return at 65535")
    assert(r.getLong(2) == r.getLong(0), "all divisor checkpoints clear")
    assert(r.getLong(4) == 1L, "maximal-period certificate")
    assert(r.getLong(5) == 0L, "state always nonzero and < 2^16")
  }
}
