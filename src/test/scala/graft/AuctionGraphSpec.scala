package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the perfection-and-incentives wave
  * (q489-q491): greedy coloring replayed, Vickrey case analysis,
  * truss monotonicity.
  */
class AuctionGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q489 interval coloring: greedy replayed, perfection exact") {
    import org.apache.spark.sql.functions._
    val spans = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("o_orderkey"),
        expr("cast(datediff(cast(o_orderdate as date), date '1990-01-01') as bigint)").as("s0"))
      .agg(greatest(max(expr(
        "cast(datediff(cast(l_shipdate as date), date '1990-01-01') as bigint)")),
        min(expr(
          "cast(datediff(cast(o_orderdate as date), date '1990-01-01') as bigint)")))
        .as("e0"))
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(1), r.getLong(3))))
    var (colorsTot, peakTot, viol) = (0L, 0L, 0L)
    spans.groupBy(_._1).foreach { case (_, xs) =>
      val ivs = xs.map(_._2).sortBy(t => (t._1, t._2, t._3))
      val rooms = scala.collection.mutable.ArrayBuffer[Long]()
      ivs.foreach { case (s0, _, e0) =>
        rooms.indexWhere(_ < s0) match {
          case -1 => rooms += e0
          case i  => rooms(i) = e0
        }
      }
      val deltas = ivs.flatMap(t => Seq((t._1, 1L), (t._3 + 1L, -1L)))
        .sortBy(identity)
      var (open, pk) = (0L, 0L)
      deltas.foreach { case (_, d) => open += d; pk = math.max(pk, open) }
      if (rooms.length.toLong != pk) viol += 1L
      colorsTot += rooms.length.toLong; peakTot += pk
    }
    assert(viol == 0L, "perfection theorem in the replay too")
    val Array(r) = run("q489_interval_coloring").collect()
    assert(r.getLong(2) == colorsTot, "colors bit-equal")
    assert(r.getLong(4) == peakTot, "peaks bit-equal")
    assert(r.getLong(2) == r.getLong(4), "colors_total = peak_total")
    assert(r.getLong(6) == 0L, "zero perfection violations")
  }

  test("q490 Vickrey: all four certificates at 100%") {
    val Array(r) = run("q490_vickrey_audit").collect()
    val n = r.getLong(0)
    assert(n > 10L)
    (1 to 4).foreach(i => assert(r.getLong(i) == n, s"certificate $i"))
    assert(r.getLong(5) >= r.getLong(5) - r.getLong(6),
      "revenue >= winner-bid total")
    assert(r.getLong(6) >= 0L, "information rent nonnegative")
  }

  test("q491 k-truss: monotone peel, fixpoint reached") {
    val rows = run("q491_ktruss").collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    rows.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "edge count monotone nonincreasing")
      case _           =>
    }
    // by round 3 a fixpoint: same count and same edge-set hash as round 2
    assert(rows(3).getLong(2) == rows(2).getLong(2), "converged count")
    assert(rows(3).getLong(3) == rows(2).getLong(3), "converged edge set")
  }
}
