package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the reconciliation surface (ReconQueries,
  * q264-q266): the join matrix satisfies its algebraic identities
  * against REAL joins, the reconciliation census partitions all
  * orders, and systematic PPS hits its sample size with a tight HT
  * estimate.
  */
class ReconSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q264 join matrix: counts equal the actual joins, identities hold") {
    val Array(r) = run("q264_join_matrix").collect()
    val (inner, left, right, full, semi, anti) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("k"))
    val o = Tables.orders(spark, sf).select(col("o_custkey").as("k"))
    assert(inner == c.join(o, "k").count())
    assert(left == c.join(o, Seq("k"), "left").count())
    assert(right == c.join(o, Seq("k"), "right").count())
    assert(full == c.join(o, Seq("k"), "full").count())
    assert(semi == c.join(o, Seq("k"), "semi").count())
    assert(anti == c.join(o, Seq("k"), "anti").count())
    assert(full == left + right - inner, "outer-join row algebra")
  }

  test("q265 reconciliation: buckets partition every order") {
    val rows = run("q265_reconciliation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._2).sum == Tables.orders(spark, sf).count())
    val names = rows.map(_._1).toSet
    assert(names.subsetOf(Set("exact", "within_1pct", "within_10pct", "divergent")))
    rows.foreach { case (b, _, worst) =>
      if (b == "exact") assert(worst == 0)
      if (b == "within_1pct") assert(worst > 0 && worst <= 100)
      if (b == "within_10pct") assert(worst > 100 && worst <= 1000)
      if (b == "divergent") assert(worst > 1000)
    }
  }

  test("q266 systematic PPS: sample near n=200; HT lands within 5% of truth") {
    val Array(r) = run("q266_systematic_pps").collect()
    val (n, ht, truth, err) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= 150 && n <= 250, s"systematic design yields ~200 picks, got $n")
    assert(err == math.abs(ht - truth) * 10000 / truth)
    assert(err <= 500, s"PPS+HT within 5% of the true total (err_e4=$err)")
  }
}
