package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the impact-and-evaluation wave
  * (ImpactQueries, q377-q380): leakage-free eval accounting, blast
  * radius bounds, migration-matrix mass conservation, and the
  * bake-off's held-out honesty.
  */
class ImpactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q377 rec eval: rates recompute, MRR bounded by hit rate") {
    val Array(r) = run("q377_rec_eval").collect()
    val (n, hits, rrSum, hitRate, mrr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && hits >= 0 && hits <= n)
    assert(hitRate == hits * 10000 / n)
    assert(mrr == rrSum / n)
    // each reciprocal rank <= 1, so MRR <= hit rate (both e4)
    assert(mrr <= hitRate)
  }

  test("q378 blast radius: bad revenue bounded, affected cells bounded") {
    val rows = run("q378_blast_radius").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    var anyAffected = false
    rows.foreach { case (_, cells, affected, rev, bad, share) =>
      assert(affected >= 0 && affected <= cells)
      assert(bad >= 0 && bad <= rev)
      assert(share == affected * 10000 / cells)
      if (affected > 0) anyAffected = true
    }
    assert(anyAffected, "the 1-in-97 corruption must touch at least one cell")
  }

  test("q379 migration: shares recompute; impossible corners absent") {
    val rows = run("q379_segment_migration").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    rows.foreach { case (f, t, nc, share) =>
      assert(Set("vip", "regular", "new").contains(f))
      assert(Set("vip", "regular", "lapsed").contains(t))
      assert(nc > 0)
      assert(share == nc * 10000 / total)
    }
    // 'new' customers have no H1 row, 'lapsed' no H2 row — a customer
    // can't be both
    assert(!rows.exists(r => r._1 == "new" && r._2 == "lapsed"))
  }

  test("q380 imputation bake-off: winner consistent with the emitted MAEs") {
    val Array(r) = run("q380_imputation_bakeoff").collect()
    val (n, lin, wk, winner) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    assert(n > 0, "the md5 mask must hold back some observed days")
    assert(lin >= 0 && wk >= 0)
    assert(winner == (if (lin <= wk) "linear" else "weekday_mean"))
  }
}
