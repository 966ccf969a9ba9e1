package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the disclosure wave (q413-q416): ladder
  * accounting, greedy-optimality dominance, attack/fix closure, and
  * the Euclidean identity.
  */
class DisclosureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q413 ladder: cells and rows partition exactly, levels ordered") {
    val rows = run("q413_kanon_ladder").collect()
    assert(rows.nonEmpty)
    val totalRows = rows.map(_.getLong(2)).sum
    val nt = Tables.orders(spark, sf).count()
    assert(totalRows == nt, "every order resolves at exactly one level")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 5))
    // generalization must resolve something above L0 on this sparse grain
    assert(rows.exists(r => r.getLong(0) > 0 && r.getLong(1) > 0))
  }

  test("q414 scheduling: earliest-end dominates, driver replay") {
    val Array(r) = run("q414_interval_schedule").collect()
    assert(r.getLong(4) == 0L, "earliest-end is optimal: it never loses")
    assert(r.getLong(2) >= r.getLong(3), "sum dominance follows")
    assert(r.getLong(2) <= r.getLong(1))
    // driver replay of both greedy folds
    val iv = {
      val o = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      val li = Tables.lineitem(spark, sf)
        .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("sd"))
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("od"), col("sd"))
        .collect().map(x => (x.getLong(0), x.getLong(1),
          x.getDate(2).toLocalDate, x.getDate(3).toLocalDate))
    }
    val d0 = iv.map(_._3).min
    def day(d: java.time.LocalDate) = java.time.temporal.ChronoUnit.DAYS.between(d0, d)
    val ivd = iv.map { case (u, ok, od, sd) =>
      (u, ok, day(od), math.max(day(sd), day(od)))
    }
    def greedy(xs: Seq[(Long, Long, Long)]): Long = { // (sortKeyApplied already)
      var le = -1L; var cnt = 0L
      xs.foreach { case (st, e, _) => if (st > le) { le = e; cnt += 1 } }
      cnt
    }
    var ee = 0L; var es = 0L
    ivd.groupBy(_._1).foreach { case (_, g) =>
      ee += greedy(g.map(x => (x._3, x._4, x._2)).sortBy(x => (x._2, x._1, x._3)))
      es += greedy(g.map(x => (x._3, x._4, x._2)).sortBy(x => (x._1, x._2, x._3)))
    }
    assert(r.getLong(2) == ee && r.getLong(3) == es)
  }

  test("q415 attack: recovery is exact, the fix closes it") {
    val Array(r) = run("q415_differencing_attack").collect()
    assert(r.getLong(1) == r.getLong(0) * 5, "dense 5-cell spine per row")
    assert(r.getLong(3) == r.getLong(4),
      "every exactly-one-suppressed row recovers its cell exactly")
    assert(r.getLong(3) > 0, "the corpus must exercise the attack")
    assert(r.getLong(5) + r.getLong(6) == r.getLong(3),
      "each recoverable row gets a complementary cell or a total suppression")
    assert(r.getLong(7) == 0L, "zero recoverable after the fix")
  }

  test("q416 semantics: Euclidean identity and pmod range hold") {
    val Array(r) = run("q416_intdiv_semantics").collect()
    assert(r.getLong(1) > 0, "the spread must produce negative deltas")
    assert(r.getLong(2) == 0L, "d = 7*(d div 7) + d%7 on every row")
    assert(r.getLong(3) == 0L, "pmod = ((d%7)+7)%7 on every row")
    assert(r.getLong(4) >= -6 && r.getLong(4) < 0, "r7 goes negative")
    assert(r.getLong(6) == 0 && r.getLong(7) == 6, "pmod spans 0..6")
  }
}
