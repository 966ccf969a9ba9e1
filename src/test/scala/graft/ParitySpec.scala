package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the parity-and-replay wave (q397-q400):
  * a driver replay of the HOF basket math, leakage bounds on the
  * next-event split, the KMV estimator's exact-below-k property, and
  * the per-segment AUC identity against the global pooled run.
  */
class ParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q397 HOF matrix equals a driver replay of the basket math") {
    val Array(r) = run("q397_hof_matrix").collect()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        expr("cast(round(l_extendedprice * 100) as bigint)"),
        expr("cast(l_quantity as bigint)"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val byK = rows.groupBy(_._1)
    var totTaxed = 0L; var totAbove = 0L; var totRev = 0L; var totFirst2 = 0L
    byK.values.foreach { xs =>
      val sorted = xs.sortBy(x => (x._2, x._3, x._4))
      val ps = sorted.map(_._3); val qs = sorted.map(_._4)
      totTaxed += ps.map(p => p * 108 / 100).sum
      val mean = ps.sum / ps.length
      totAbove += ps.count(_ > mean)
      totRev += ps.zip(qs).map { case (p, q) => p * q }.sum
      totFirst2 += ps.take(2).sum
    }
    assert(r.getLong(0) == byK.size)
    assert(r.getLong(2) == totTaxed, "transform+aggregate must match replay")
    assert(r.getLong(3) == totAbove, "filter-above-mean must match replay")
    assert(r.getLong(6) == totRev, "zip_with revenue must match replay")
    assert(r.getLong(7) == totFirst2, "slice first-2 must match replay")
  }

  test("q398 next-event eval: counts consistent, accuracy beats or ties nothing impossible") {
    val Array(r) = run("q398_nextevent_eval").collect()
    val (nTest, nHit, nBase) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (acc, baseAcc, lift) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nTest > 0 && nHit <= nTest && nBase <= nTest)
    assert(acc == nHit * 10000 / nTest && baseAcc == nBase * 10000 / nTest)
    assert(lift == acc - baseAcc)
    // the bigram model CONTAINS the majority predictor as its fallback;
    // on seen prevs it picks per-prev argmax — can differ either way,
    // but both accuracies live in [0, 10000]
    assert(acc >= 0 && acc <= 10000 && baseAcc >= 0 && baseAcc <= 10000)
  }

  test("q399 KMV rollup: exact when under k, bounded error always") {
    val Array(r) = run("q399_kmv_rollup").collect()
    val (nDays, maxErr, meanErr) = (r.getLong(0), r.getLong(2), r.getLong(3))
    assert(nDays > 0)
    assert(meanErr <= maxErr)
    // k=64 KMV: relative error concentrates ~1/√(k−2) ≈ 12.7%; allow
    // 3σ ≈ 38% worst-day — far below a broken estimator (100%+), far
    // above floor noise. Exact-mode days (under 64 uniques) are 0-err.
    assert(maxErr <= 3800, s"KMV worst-day error $maxErr e4 beyond 3σ of k=64")
  }

  test("q400 parity: segment AUCs pool to the global rank-sum, gaps consistent") {
    val segs = run("q400_metric_parity").collect()
    assert(segs.length > 1)
    val aucs = segs.map(_.getLong(3)); val rates = segs.map(_.getLong(4))
    val (aucGap, rateGap) = (segs.head.getLong(5), segs.head.getLong(6))
    assert(segs.forall(r => r.getLong(5) == aucGap && r.getLong(6) == rateGap))
    assert(aucGap == aucs.max - aucs.min)
    assert(rateGap == rates.max - rates.min)
    aucs.foreach(a => assert(a >= 0 && a <= 1000000))
    // each segment's (n_pos + n_neg) sums to the joined corpus size
    val n = segs.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey")).count()
    assert(n == expected)
  }
}
