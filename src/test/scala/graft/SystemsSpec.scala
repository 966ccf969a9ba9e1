package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the systems/linear-algebra wave
  * (q441-q444): Rayleigh bracketing, Yannakakis no-dangling
  * certificate, Z-set IVM exactness, LRU driver replay.
  */
class SystemsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q441 power iteration: Rayleigh bracketed, eigen-share above mean") {
    val Array(r) = run("q441_power_iteration").collect()
    val (d, lambda, trace) = (r.getLong(0), r.getLong(2), r.getLong(3))
    assert(d == 64L)
    assert(lambda >= trace / d, "top eigenvalue at least the mean eigenvalue")
    assert(lambda <= trace, "top eigenvalue at most the trace (PSD)")
    val (rmin, rmax) = (r.getLong(6), r.getLong(7))
    assert(rmin <= lambda && lambda <= rmax,
      s"Rayleigh quotient bracketed by component ratios: $rmin <= $lambda <= $rmax")
    assert(r.getLong(4) >= 10000L / d, "top share at least uniform 1/64")
    assert(r.getLong(5) >= 1L && r.getLong(5) <= d)
    assert(r.getLong(8) >= 0L && r.getLong(8) <= 10000L)
    assert(r.getLong(9) >= 1L && r.getLong(9) <= d)
  }

  test("q442 Yannakakis: no dangling tuples survive, joins agree") {
    val rows = run("q442_yannakakis").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(5) == 1L, s"${r.getString(0)}: dangling tuple survived")
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        "reduction is monotone")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
    val res = rows.find(_.getString(0) == "6_result").get
    assert(res.getLong(4) == 0L, "reduced join == direct join")
  }

  test("q443 Z-set IVM: delta-apply equals recompute, MIN fails honestly") {
    val Array(r) = run("q443_zset_ivm").collect()
    assert(r.getLong(6) == 0L, "cell-exact incremental maintenance")
    assert(r.getLong(7) == 0L, "vanished groups carry zero revenue")
    assert(r.getLong(4) + r.getLong(5) == r.getLong(3),
      "after + vanished = before (updates never create groups)")
    assert(r.getLong(1) + r.getLong(2) <= r.getLong(0) / 5,
      "delta batch is the hash-selected tenth")
    assert(r.getLong(8) <= r.getLong(4),
      "oblivious-min failures bounded by surviving groups")
  }

  test("q444 LRU: accounting closes, driver replay agrees") {
    val Array(r) = run("q444_lru_sim").collect()
    assert(r.getLong(2) + r.getLong(3) == r.getLong(0), "hits + misses = n")
    assert(r.getLong(5) + r.getLong(6) == r.getLong(3),
      "cold + capacity = misses")
    assert(r.getLong(7) == 0L, "capacity misses never negative")

    // full driver replay of the move-to-front fold
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    var hits = 0L
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var cache = List.empty[String]
      rows.sortBy(x => (x._2, x._3)).foreach { case (_, _, _, et) =>
        if (cache.contains(et)) { hits += 1; cache = et :: cache.filterNot(_ == et) }
        else cache = (et :: cache).take(3)
      }
    }
    assert(r.getLong(2) == hits, s"replayed hits: $hits vs ${r.getLong(2)}")
  }
}
