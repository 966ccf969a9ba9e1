package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the governance/eval-ops wave (q549–q551). */
class GovernanceOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q549 t-closeness: EMD replayed per class; bounds and flags") {
    import spark.implicits._
    val od = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("nat"),
        expr("substring(cast(o_orderdate as string), 1, 7)").as("month"),
        expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("pr"))
      .as[(Long, String, Long)].collect()
    val n = od.length.toLong
    val gcum = (1 to 4).map(k => od.count(_._3 <= k).toLong)
    val replay = od.groupBy(r => (r._1, r._2)).map { case ((nat, m), rows) =>
      val cn = rows.length.toLong
      val emd = (1 to 4).map { k =>
        val ck = rows.count(_._3 <= k).toLong
        math.abs(ck * 1000000 / cn - gcum(k - 1) * 1000000 / n)
      }.sum / 4
      (nat, m) -> emd
    }
    val byNat = replay.groupBy(_._1._1).map { case (nat, cls) =>
      val worst = cls.minBy { case ((_, m), e) => (-e, m) }
      nat -> (cls.size.toLong, cls.values.max,
        cls.values.count(_ > 150000L).toLong, worst._1._2)
    }
    val got = run("q549_t_closeness").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getString(5))).toMap
    assert(got.keySet == byNat.keySet)
    byNat.foreach { case (nat, v) =>
      assert(got(nat) == v, s"nation $nat: replay $v vs ${got(nat)}") }
    got.values.foreach { case (nc, maxE, over, _) =>
      assert(maxE >= 0 && maxE <= 1000000L, "EMD is a share gap in [0,1]")
      assert(over <= nc)
    }
  }

  test("q550 bpref: bounded, consistent with judged pool sizes") {
    val rows = run("q550_bpref").collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val (rj, nj, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rj >= 1, "a query row exists only with judged relevant docs")
      assert(nj >= 0)
      assert(bp >= 0 && bp <= 1000000L, "bpref is a mean of [0,1] terms")
    }
  }

  test("q551 novelty: both arms present, self-information well-formed") {
    val rows = run("q551_rec_novelty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("lift", "support"))
    rows.foreach { case (arm, n, mean, mn, mx) =>
      assert(n >= 1, s"$arm surfaced items")
      assert(mn <= mean && mean <= mx, s"$arm moment ordering")
      assert(mn >= 0, "-ln(pop) >= 0 for pop <= 1")
      // popularity shares are clipped to >= 1e-6, so self-information
      // is bounded by ln(1e6)
      assert(mx <= 13815510558L)
    }
  }
}
