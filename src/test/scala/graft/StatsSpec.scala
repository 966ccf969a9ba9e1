package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the stats wave (StatsQueries, q321-q324):
  * the ANALYZE pass covers every column with sane bounds, the merge
  * identities are all true, staleness drift recomputes, and the
  * equi-width histogram is dense with conserved mass.
  */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q321 ANALYZE: six columns, ndv ≤ rows, keys unique, no nulls in fixture") {
    val rows = run("q321_analyze_stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(rows.length == 6)
    val n = rows.head._2
    rows.foreach { case (c, nr, ndv, nul, lo, hi) =>
      assert(nr == n, "every column row reports the same table cardinality")
      assert(ndv >= 1 && ndv <= n)
      assert(nul == 0, s"$c: fixture has no nulls")
      assert(lo != null && hi != null)
    }
    assert(rows.find(_._1 == "o_orderkey").get._3 == n, "primary key NDV = row count")
  }

  test("q322 stats merge: every identity boolean true, halves non-trivial") {
    val Array(r) = run("q322_stats_merge").collect()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0, "md5 halves must both be populated")
    assert(r.getBoolean(4), "counts must add")
    assert(r.getBoolean(5), "min must fold")
    assert(r.getBoolean(6), "max must fold")
    assert(r.getBoolean(7), "NDV must be bracketed by the half NDVs")
  }

  test("q323 staleness: drift recomputes, rebuild iff any drift over 10%") {
    val Array(r) = run("q323_stats_staleness").collect()
    val (nOld, nCur) = (r.getLong(0), r.getLong(1))
    assert(nOld > 0 && nCur >= nOld)
    val rowsDrift = r.getLong(6); val ndvDrift = r.getLong(7); val maxDrift = r.getLong(8)
    assert(rowsDrift == (nCur - nOld) * 10000 / math.max(nOld, 1))
    assert(r.getBoolean(9) ==
      (rowsDrift > 1000 || ndvDrift > 1000 || math.abs(maxDrift) > 1000))
  }

  test("q324 equi-width: dense 20-bin spine, mass conserved, bins inside domain") {
    val rows = run("q324_equiwidth_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20, "spine must emit empty bins too")
    assert(rows.map(_._1).sorted.sameElements(0L until 20L))
    val total = rows.map(_._2).sum
    assert(total == Tables.orders(spark, sf).count())
    val shareSum = rows.map(_._3).sum
    assert(shareSum <= 10000 && shareSum > 10000 - 20)
  }
}
