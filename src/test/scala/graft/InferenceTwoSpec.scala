package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the inference-completion wave (q433-q436):
  * conformal rank/coverage bounds, DR estimator algebra, median-CI
  * bracketing, SPRT decision consistency with a driver recomputation.
  */
class InferenceTwoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q433 conformal: split sizes, rank bound, coverage in range") {
    val rows = run("q433_conformal_interval").collect()
    assert(rows.length >= 2, "one row per priority")
    val (nc, nt) = (rows.head.getLong(1), rows.head.getLong(2))
    rows.foreach { r =>
      assert(r.getLong(1) == nc && r.getLong(2) == nt,
        "shared calendar => identical split sizes across priorities")
      assert(r.getLong(3) >= 0L, "half-width nonnegative")
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
      // the 80%-target interval should not collapse: coverage > 50%
      assert(r.getLong(5) >= 5000L, s"coverage degenerate: ${r.getLong(5)}")
    }
    assert(nc >= 4 * nt / 2, "80/20 time split: cal ~4x test")
  }

  test("q434 doubly robust: estimator algebra and ranges") {
    val Array(r) = run("q434_doubly_robust").collect()
    val (n, m) = (r.getLong(0), r.getLong(1))
    assert(m <= n && m > 0)
    val (vb, vdm, vips, corr, vdr) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    Seq(vb, vdm, vips).foreach(v => assert(v >= 0 && v <= 1000000L))
    // v_dr = v_dm + correction up to independent e6 truncations
    assert(math.abs(vdr - (vdm + corr)) <= 2L,
      s"DR decomposition: $vdr vs ${vdm + corr}")
    // the DM arm prices rows by per-action means: it must sit inside
    // the action-mean envelope, i.e. within [0, 1e6] and near behavior
    assert(math.abs(vdm - vb) < 500000L)
  }

  test("q435 median CI: brackets the median in every nation") {
    val rows = run("q435_median_ci").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo >= 1L && hi <= n && lo <= hi, s"ranks sane: $lo..$hi of $n")
      assert(r.getLong(8) == 1L, "ci_lo <= median <= ci_hi")
      assert(r.getLong(7) >= 0L)
      // the CI must not span the whole sample on any real nation
      if (n >= 100) assert(hi - lo < n, "nondegenerate bracket")
    }
  }

  test("q436 SPRT: decisions consistent with boundaries, llr replayed") {
    val rows = run("q436_sprt").collect()
    val A = 2944439L
    rows.foreach { r =>
      val (n, s2, dec, nd, llr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      dec match {
        case 2L => assert(llr >= A && nd >= 1 && nd <= n)
        case 1L => assert(llr <= -A && nd >= 1 && nd <= n)
        case 0L =>
          assert(math.abs(llr) < A && nd == 0L)
          // never frozen => final llr is the full-stream sum, order-free
          assert(llr == s2 * 100083L - (n - s2) * 66691L,
            s"undecided llr must equal s*ln(p1/p0)+(n-s)*ln((1-p1)/(1-p0))")
        case d => fail(s"decision out of domain: $d")
      }
    }
  }
}
