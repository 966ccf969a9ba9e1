package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the drift/inference and budget/storage
  * waves (q453-q456): W1 replayed in the driver, DeLong vs q393
  * agreement, knapsack DP replayed, LSM closed-form certificate.
  */
class DriftCostSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q453 Wasserstein: Jensen bound holds, driver replay agrees") {
    val Array(r) = run("q453_wasserstein_drift").collect()
    assert(r.getLong(6) == 1L, "W1 >= |meanA - meanB| (Jensen)")
    assert(r.getLong(3) >= r.getLong(4))
    assert(r.getLong(5) > 0L && r.getLong(5) < 1000000L)

    // driver replay of the exact integral
    val rows = Tables.orders(spark, sf)
      .selectExpr("cast(round(o_totalprice * 100) as bigint) as v",
        "case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
          "then 1 else 0 end as isa")
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val na = rows.count(_._2 == 1).toLong
    val nb = rows.length - na
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var (cumA, cumB, area) = (0L, 0L, BigInt(0))
    byV.zipWithIndex.foreach { case ((v, grp), i) =>
      cumA += grp.count(_._2 == 1); cumB += grp.count(_._2 == 0)
      if (i + 1 < byV.length)
        area += BigInt((cumA * nb - cumB * na).abs) * (byV(i + 1)._1 - v)
    }
    val w1 = area * 10000 / (BigInt(na) * nb)
    assert(BigInt(r.getLong(3)) == w1, s"replayed W1: $w1 vs ${r.getLong(3)}")
  }

  test("q454 DeLong: CI brackets the AUC and matches q393 exactly") {
    val Array(r) = run("q454_delong_auc_ci").collect()
    assert(r.getLong(4) == 1L, "U-statistic symmetry")
    val (auc, lo, hi) = (r.getLong(3), r.getLong(7), r.getLong(8))
    assert(lo <= auc && auc <= hi)
    assert(r.getLong(6) > 0L, "nonzero standard error")
    val Array(q393) = run("q393_roc_auc").collect()
    assert(q393.getLong(q393.length - 1) == auc,
      "DeLong's point estimate IS q393's exact AUC")
  }

  test("q455 knapsack: DP dominates greedy, monotone, driver replay") {
    val Array(r) = run("q455_knapsack").collect()
    assert(r.getLong(6) == 0L, "DP never below the density greedy")
    assert(r.getLong(7) == 0L, "dp monotone in budget")
    assert(r.getLong(8) == 0L, "opt bounded by the value total")

    val items = Tables.lineitem(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("l_orderkey").as("okey"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey as okey",
        "o_custkey as c", "cast(round(o_totalprice * 100) as bigint) as v"),
        "okey")
      .selectExpr("c", "cast(w as bigint) as w", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    var optTotal = 0L
    items.groupBy(_._1).foreach { case (_, rows) =>
      val dp = new Array[Long](13)
      rows.foreach { case (_, w, v) =>
        for (b <- 12 to 0 by -1)
          if (w <= b) dp(b) = math.max(dp(b), v + dp((b - w).toInt))
      }
      optTotal += dp(12)
    }
    assert(r.getLong(2) == optTotal, s"replayed OPT: $optTotal vs ${r.getLong(2)}")
  }

  test("q456 LSM: fold equals closed form, both policies priced") {
    val Array(r) = run("q456_lsm_costing").collect()
    assert(r.getLong(4) == 1L, "tiered fold == complete-group closed form")
    assert(r.getLong(2) >= r.getLong(1), "writes at least the ingest")
    assert(r.getLong(6) >= r.getLong(1))
    assert(r.getLong(5) >= 10000L && r.getLong(7) >= 10000L,
      "write amp at least 1x")
    assert(r.getLong(8) >= 1L, "the leveled policy actually spills")
  }
}
