package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the optimality/matching/sliding-sketch
  * waves (q449-q452): Belady dominance with a driver replay,
  * Gale-Shapley stability with a driver replay, stationary-
  * distribution fixed-point bounds, DGIM guarantee closure.
  */
class OptimalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q449 Belady: optimality counted at zero, driver replay agrees") {
    val Array(r) = run("q449_belady_opt").collect()
    assert(r.getLong(7) == 0L, "no user where LRU beats MIN")
    assert(r.getLong(3) >= r.getLong(2), "OPT hits >= LRU hits in total")

    // driver replay of MIN with future knowledge
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    var optHits = 0L
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val seqd = rows.sortBy(x => (x._2, x._3)).map(_._4)
      var cache = Set.empty[String]
      seqd.zipWithIndex.foreach { case (et, idx) =>
        if (cache.contains(et)) optHits += 1
        else {
          if (cache.size == 3) {
            // evict the entry with the farthest next use (ties: larger type)
            val victim = cache.maxBy { k =>
              val nu = seqd.indexWhere(_ == k, idx + 1)
              (if (nu < 0) Long.MaxValue else nu.toLong, k)
            }
            cache -= victim
          }
          cache += et
        }
      }
    }
    assert(r.getLong(3) == optHits, s"replayed MIN hits: $optHits vs ${r.getLong(3)}")
  }

  test("q450 stable matching: zero blocking pairs, matching is injective") {
    val rows = run("q450_stable_matching").collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(r.getLong(6) == 0L, "a blocking pair survived"))
    val matched = rows.filter(_.getLong(5) == 1L)
    val sup = matched.map(_.getLong(1))
    assert(sup.distinct.length == sup.length, "each supplier matched once")
    assert(rows.head.getLong(7) <= 650L, "proposal bound n^2 + n")
    matched.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(4) >= 1L, "ranks are 1-based")
    }
    // with s suppliers available, exactly min(25, s) nations match
    val nSup = Tables.supplier(spark, sf).count().min(25)
    assert(matched.length == nSup.toInt, s"matched ${matched.length} of $nSup")
  }

  test("q451 stationary: probability mass, fixed point, plausible gap") {
    val rows = run("q451_markov_stationary").collect()
    assert(rows.length == 5)
    val piSum = rows.map(_.getLong(1)).sum
    assert(math.abs(piSum - 1000000L) <= 5L, s"pi mass: $piSum")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, "irreducible chain: all states charged")
      assert(math.abs(r.getLong(3)) < 50000L,
        "stationary within 5pp of the empirical marginal")
      assert(r.getLong(4) >= 0L && r.getLong(4) < 1000L,
        s"fixed-point residual small: ${r.getLong(4)}")
    }
  }

  test("q452 DGIM: guarantee and invariant counted at zero, truth replayed") {
    val Array(r) = run("q452_dgim_window").collect()
    assert(r.getLong(6) == 0L, "half-oldest-bucket bound holds per user")
    assert(r.getLong(7) == 0L, "at most two buckets per size")
    assert(r.getLong(4) >= r.getLong(5), "sum of errors >= max error")

    // replay the exact trailing-64 truth
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    val truth = ev.groupBy(_._1).map { case (_, rows) =>
      rows.sortBy(x => (x._2, x._3)).takeRight(64).count(_._4 == "purchase").toLong
    }.sum
    assert(r.getLong(2) == truth, s"replayed truth: $truth vs ${r.getLong(2)}")
  }
}
