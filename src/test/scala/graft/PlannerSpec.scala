package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the planner-statistics surface
  * (PlannerQueries, q224-q226): histogram buckets tile the domain and
  * the estimator reconciles, the MCV ledger conserves mass, and the
  * pruned layout reads exactly the predicate months with a
  * PartitionFilters-bearing scan.
  */
class PlannerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q224 histogram: buckets partition all rows; est exact on fully-covered buckets") {
    val rows = run("q224_histogram_selectivity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 16L))
    assert(rows.map(_._2).sum == Tables.orders(spark, sf).count())
    // boundaries are non-decreasing across buckets (equi-depth over a total order)
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1, _, _), (_, _, lo2, _, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    rows.foreach { case (_, n, lo, hi, est, act) =>
      assert(est >= 0 && est <= n && act >= 0 && act <= n)
      // a bucket entirely inside the range estimates itself exactly
      if (lo >= 10000000L && hi < 25000000L) assert(est == n && act == n)
      if (hi < 10000000L || lo >= 25000000L) assert(est == 0 && act == 0)
    }
  }

  test("q225 MCV: mass conservation and exact estimates inside the MCV list") {
    val rows = run("q225_mcv_selectivity").collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byFlag = rows.map(r => r._1 -> r).toMap
    assert(byFlag.contains(true) && byFlag.contains(false))
    val (_, nMcv, actMcv, estMcv, errMcv) = byFlag(true)
    assert(nMcv == 10, "top-10 MCV list")
    assert(actMcv == estMcv && errMcv == 0, "MCV estimates are exact by construction")
    val total = rows.map(_._3).sum
    assert(total == Tables.lineitem(spark, sf).count(), "every key audited")
  }

  test("q226 pruning: exactly the predicate months, one file each, pruned scan") {
    val df = run("q226_partition_pruning")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expectMonths = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .filter(col("m").between("1996-01", "1996-06"))
      .groupBy("m").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.map(_._1).toSet == expectMonths.keySet)
    rows.foreach { case (m, n, files) =>
      assert(n == expectMonths(m), s"month $m row count")
      assert(files == 1L, s"month $m is one file (layout contract)")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"),
      "month predicate satisfied by directory pruning")
  }
}
