package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the physical-design/estimator wave
  * (q405-q408): zone-map soundness and payoff ordering, the
  * decorrelation identity, RLE layout dominance, and a full driver
  * replay of the IPS/replay estimators.
  */
class AdvisorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q405 zone maps: sound (zero false skips) and clustering pays") {
    val rows = run("q405_zonemap_skip").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("clustered", "hash"))
    rows.values.foreach { r =>
      assert(r.getLong(6) == 0L, "a skipped file held a qualifying row")
      assert(r.getLong(4) <= r.getLong(3), "scanned cannot exceed total")
      assert(r.getLong(5) <= r.getLong(4), "qualifying rows live in scanned files")
    }
    val (cl, ha) = (rows("clustered"), rows("hash"))
    assert(cl.getLong(3) == ha.getLong(3), "both layouts hold the same rows")
    assert(cl.getLong(5) == ha.getLong(5), "the predicate is layout-independent")
    assert(cl.getLong(2) > ha.getLong(2), "clustering must skip more files")
    assert(cl.getLong(4) < ha.getLong(4), "clustering must scan fewer rows")
  }

  test("q406 decorrelation: subquery form equals the join rewrite") {
    val Array(r) = run("q406_decorrelate_certificate").collect()
    assert(r.getLong(0) > 0, "some orders sit above their customer average")
    assert(r.getLong(4) == 1L, "the two plan shapes must agree")
    assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3))
  }

  test("q407 RLE: self-sorted layout dominates, byte accounting closes") {
    val rows = run("q407_rle_advisor").collect()
    assert(rows.length == 9)
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    m.values.foreach { r =>
      val (runs, n, plain, rle) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(runs >= 1 && runs <= n)
      assert(rle <= plain + 4 * runs, "RLE never exceeds plain + run headers")
      assert(rle >= runs * 5 || plain < runs * 5)
    }
    for (c <- Seq("returnflag", "linestatus", "day")) {
      assert(m(("self", c)).getLong(2) <= m(("hash", c)).getLong(2),
        s"self-sorted must not have more runs than hash order for $c")
    }
    // low-cardinality columns compress dramatically under their own sort
    assert(m(("self", "returnflag")).getLong(2) < 200)
    assert(m(("hash", "returnflag")).getLong(2) >
      m(("self", "returnflag")).getLong(2) * 10)
  }

  test("q408 IPS: full driver replay of every estimator") {
    val Array(r) = run("q408_ips_policy_eval").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val n = ev.length.toLong
    // rewards: purchase within 1h strictly after, per user in (us, eid) order
    val byU = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(x => (x._3, x._4))
    }
    val pi = byU.map { case (u, rs) =>
      u -> rs.groupBy(_._2).map { case (a, g) => (a, g.size) }
        .toSeq.minBy { case (a, c) => (-c, a) }._1
    }
    val matched = byU.toSeq.flatMap { case (u, rs) =>
      rs.zipWithIndex.map { case (x, i) =>
        val hit = rs.drop(i + 1).exists(y =>
          y._2 == "purchase" && y._3 <= x._3 + 3600000000L)
        (x._2, if (hit) 1L else 0L, if (x._2 == pi(u)) 1L else 0L)
      }
    }
    val na = ev.groupBy(_._2).map { case (a, g) => a -> g.size.toLong }
    val nMatched = matched.map(_._3).sum
    val rTotal = matched.map(_._2).sum
    val vIps = na.keys.toSeq.sorted.map { a =>
      val rA = matched.filter(x => x._1 == a && x._3 == 1L).map(_._2).sum
      rA * 1000000L / na(a)
    }.sum
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == nMatched)
    assert(r.getLong(2) == nMatched * 10000L / n)
    assert(r.getLong(3) == rTotal * 1000000L / n)
    val rMatched = matched.filter(_._3 == 1L).map(_._2).sum
    assert(r.getLong(4) == rMatched * 1000000L / math.max(nMatched, 1L))
    assert(r.getLong(5) == vIps, "IPS must telescope to sum_a r_a/n_a")
    assert(r.getLong(6) == n * 10000L / na.values.min)
  }
}
