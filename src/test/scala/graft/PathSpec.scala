package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the navigation/sampling surface
  * (PathQueries, q248-q250): paths census every session, negatives
  * never collide with positives, and the encoding advisor's
  * arithmetic recomputes.
  */
class PathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q248 path census: top paths census sums to a subset of all sessions") {
    val rows = run("q248_path_census").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(a >= b)
      case _ =>
    }
    val nSessions = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(rows.map(_._2).sum <= nSessions)
    rows.foreach { case (p, _) =>
      assert(p.split(">").length <= 3 && p.nonEmpty)
    }
  }

  test("q249 negative samples: no sampled pair is a positive; ranks well-formed") {
    val rows = run("q249_negative_samples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    assert(rows.nonEmpty && rows.map(_._1).toSet.subsetOf(Set(1L, 2L)))
    // rank-1 count >= rank-2 count (a pair only has a 2nd negative if it has a 1st)
    val byRank = rows.map(r => r._1 -> r._2).toMap
    assert(byRank.getOrElse(1L, 0L) >= byRank.getOrElse(2L, 0L))
    val nPos = FlowQueries.ratingsTable(spark, sf).count()
    assert(byRank(1L) <= nPos, "at most one rank-1 negative per positive")
  }

  test("q250 dict advisor: low-NDV columns win, key column loses") {
    val rows = run("q250_dict_advisor").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("o_orderstatus", "o_orderpriority", "o_orderkey"))
    val n = Tables.orders(spark, sf).count()
    rows.values.foreach { case (_, nRows, ndv, raw, dict, ratio) =>
      assert(nRows == n)
      assert(ratio == dict * 10000 / raw)
      assert(ndv <= nRows)
    }
    // 3-value status column compresses massively; unique key does not
    assert(rows("o_orderstatus")._6 < 3000, "status dict ratio < 30%")
    assert(rows("o_orderkey")._6 > 5000, "unique key gains little")
  }
}
