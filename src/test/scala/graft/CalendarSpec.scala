package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the calendar surface (CalendarQueries,
  * q251-q253): ISO weeks match java.time's ISO fields, attribution
  * deltas telescope, and the churn ledger is a consistent top-k diff.
  */
class CalendarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q251 ISO calendar: explicit Thursday-rule weeks equal java.time WeekFields") {
    val rows = run("q251_business_calendar").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    // recompute the census driver-side with java.time's ISO week fields
    val wf = java.time.temporal.WeekFields.ISO
    val direct = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("d"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      .collect().map { r =>
        val d = r.getDate(0).toLocalDate
        val key = (d.get(wf.weekBasedYear()), d.get(wf.weekOfWeekBasedYear()).toLong)
        val wkd = d.getDayOfWeek.getValue >= 6
        (key, r.getLong(1), wkd)
      }
    val agg = direct.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong,
        vs.filterNot(_._3).map(_._2).sum, vs.filter(_._3).map(_._2).sum)
    }
    assert(rows.keySet == agg.keySet, "identical ISO (week-year, week) partitions")
    agg.foreach { case (k, v) => assert(rows(k) == v, s"week $k census") }
  }

  test("q252 delta attribution: segment deltas telescope to the total") {
    val rows = run("q252_delta_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val tot = rows.head._5
    assert(rows.forall(_._5 == tot), "one total delta")
    assert(rows.map(_._4).sum == tot, "segment deltas sum to the topline move")
    rows.foreach { case (_, v1, v2, d, _) => assert(d == v2 - v1) }
  }

  test("q253 leaderboard churn: statuses consistent, both top-20s covered") {
    val rows = run("q253_leaderboard_churn").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getString(5)))
    assert(rows.count(_._3.isDefined) == 20, "20 rows from half A")
    assert(rows.count(_._5.isDefined) == 20, "20 rows from half B")
    rows.foreach { case (_, _, rkA, _, rkB, status) =>
      (rkA, rkB) match {
        case (None, Some(_)) => assert(status == "entered")
        case (Some(_), None) => assert(status == "exited")
        case (Some(a), Some(b)) =>
          assert(status == (if (a == b) "held" else "moved"))
        case _ => fail("row with neither rank")
      }
    }
  }
}
