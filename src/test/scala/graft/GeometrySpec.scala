package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the geometry wave (q486-q488): monotone
  * chain, Kadane, and Boyer-Moore all replayed in the driver.
  */
class GeometrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q486 convex hull: monotone chain replayed per nation") {
    import org.apache.spark.sql.functions._
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("bigint"),
        expr("cast(round(c_acctbal * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cnt = Tables.orders(spark, sf).groupBy("o_custkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def cross(a: (Long, Long), b: (Long, Long), c: (Long, Long)): Long =
      (b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1)
    def half(ps: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val st = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      ps.foreach { p =>
        while (st.length >= 2 && cross(st(st.length - 2), st.last, p) <= 0L)
          st.remove(st.length - 1)
        st += p
      }
      st.toSeq
    }
    val expected = cust.groupBy(_._2).map { case (nk, xs) =>
      val pts = xs.map(t => (t._3, cnt.getOrElse(t._1, 0L))).distinct.sorted
      val lo = half(pts)
      val hi = half(pts.reverse)
      val h = if (lo.length == 1) lo else lo.dropRight(1) ++ hi.dropRight(1)
      val m = h.length
      val area2 = if (m <= 2) 0L
        else (0 until m).map(i =>
          h(i)._1 * h((i + 1) % m)._2 - h((i + 1) % m)._1 * h(i)._2).sum
      (nk, (pts.length.toLong, m.toLong, area2))
    }
    val rows = run("q486_convex_hull").collect()
    assert(rows.map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap == expected,
      "hull size + area bit-equal to the driver replay")
    rows.foreach { r =>
      assert(r.getLong(4) == 1L && r.getLong(5) == 0L && r.getLong(6) == 1L)
      assert(r.getLong(3) >= 0L, "ccw orientation: nonnegative area")
    }
  }

  test("q487 Kadane: two derivations agree, replayed in the driver") {
    import org.apache.spark.sql.functions._
    val days = Tables.orders(spark, sf)
      .groupBy(expr("cast(o_orderdate as date)").as("d"))
      .agg(count(lit(1)).as("v")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).sorted
    val nd = days.length.toLong
    val tot = days.map(_._2).sum
    val xs = days.map(_._2 * nd - tot)
    var (cur, best, wcur, worst) = (xs.head, xs.head, xs.head, xs.head)
    xs.tail.foreach { x =>
      cur = math.max(x, cur + x); best = math.max(best, cur)
      wcur = math.min(x, wcur + x); worst = math.min(worst, wcur)
    }
    val Array(r) = run("q487_kadane_streak").collect()
    assert(r.getLong(0) == nd && r.getLong(1) == tot)
    assert(r.getLong(2) == best, "Kadane max bit-equal")
    assert(r.getLong(4) == worst, "Kadane min bit-equal")
    assert(r.getLong(5) == 1L, "prefix-identity derivation agrees")
    assert(r.getLong(6) == 1L, "demeaned values sum to zero")
  }

  test("q488 Boyer-Moore: replayed, theorem holds") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(substring(o_orderpriority, 1, 1) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perVal = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    o.groupBy(_._1).foreach { case (_, xs) =>
      val ps = xs.sortBy(_._2).map(_._3)
      var (cand, cnt) = (0L, 0L)
      ps.foreach { p =>
        if (cnt == 0L) { cand = p; cnt = 1L }
        else if (p == cand) cnt += 1L else cnt -= 1L
      }
      val recount = ps.count(_ == cand).toLong
      val verified = if (2 * recount > ps.length) cand else 0L
      val trueMaj = (1L to 5L).find(v =>
        2 * ps.count(_ == v) > ps.length).getOrElse(0L)
      assert(verified == trueMaj, "BM finds the majority iff it exists")
      perVal(verified) += 1L
    }
    val rows = run("q488_bm_majority").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toMap == perVal.toMap,
      "per-value customer counts bit-equal")
    rows.foreach(r => assert(r.getLong(3) == 0L, "zero theorem violations"))
  }
}
