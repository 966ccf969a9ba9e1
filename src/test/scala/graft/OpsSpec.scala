package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the operations surface (OpsQueries,
  * q257-q260): compaction conserves the log, the lateness curve is
  * monotone, water-filling is feasible and max-min optimal, and
  * assortativity lies in [-1, 1] with exact moments.
  */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q257 log compaction: partition of the log; one outcome per key") {
    val Array(r) = run("q257_log_compaction").collect()
    val (nLog, nLive, nTomb, nSup) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nLive + nTomb + nSup == nLog, "every log row classified exactly once")
    val nKeys = Tables.orders(spark, sf).count()
    assert(nLive + nTomb == nKeys, "one final outcome per key")
    assert(r.getDecimal(4).signum > 0)
  }

  test("q258 lateness curve: monotone non-increasing in the delay") {
    val rows = run("q258_lateness_curve").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(3600L, 21600L, 86400L, 259200L))
      rs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, d1, _), (_, _, d2, _)) =>
          assert(d1 >= d2, "longer watermark can only drop fewer rows")
        case _ =>
      }
    }
  }

  test("q259 fair share: feasible, demand-bounded, max-min (water level monotone)") {
    val rows = run("q259_fair_share").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val totalDemand = rows.map(_._2).sum
    val c = totalDemand / 2
    assert(rows.map(_._5).sum <= c, "allocation within capacity")
    rows.foreach { case (_, d, _, level, alloc) =>
      assert(alloc >= 0 && alloc <= d)
      assert(alloc == math.max(math.min(d, level), 0L), "alloc = min(d, L*)")
    }
    // tightness: the integer water level wastes at most n_types units
    assert(rows.map(_._5).sum >= c - rows.length,
      "floor slack bounded by the number of types")
    // max-min: every capped type gets exactly the common water level
    val level = rows.head._4
    rows.filter(r => r._2 > level).foreach(r => assert(r._5 == level))
  }

  test("q260 assortativity: r in [-1, 1] and consistent with its exact moments") {
    val Array(r) = run("q260_degree_assortativity").collect()
    val (n, num, denx, deny, rr) = (r.getLong(0), r.getDecimal(1),
      r.getDecimal(2), r.getDecimal(3), r.getDouble(4))
    assert(n > 0 && n % 2 == 0, "symmetrized edge list has even size")
    assert(denx.signum >= 0 && deny.signum >= 0)
    if (denx.signum > 0 && deny.signum > 0) {
      assert(rr >= -1.0000001 && rr <= 1.0000001)
      val expect = num.doubleValue() /
        math.sqrt(denx.doubleValue() * deny.doubleValue())
      assert(rr == expect, "r is exactly the declared function of the moments")
    }
  }
}
