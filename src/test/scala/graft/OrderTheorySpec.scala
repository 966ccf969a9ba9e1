package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the order-theory wave (q480-q482): patience
  * sorting replayed, the weighted-majority mistake bound, Elias-Fano
  * arithmetic re-derived.
  */
class OrderTheorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q480 sortedness: LIS/LDS/runs replayed in the driver") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), (r.getDate(2).toString, r.getLong(1), r.getLong(3))))
    def patience(vs: Seq[Long], below: (Long, Long) => Boolean): Int = {
      val tails = scala.collection.mutable.ArrayBuffer[Long]()
      vs.foreach { v =>
        val pos = tails.count(t => below(t, v))
        if (pos == tails.length) tails += v else tails(pos) = v
      }
      tails.length
    }
    var (nCust, nOrd, runsTot, lisTot, ldsTot) = (0L, 0L, 0L, 0L, 0L)
    o.groupBy(_._1).foreach { case (_, xs) =>
      val vs = xs.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._3).toSeq
      val lis = patience(vs, _ <= _)
      val lds = patience(vs.map(-_), _ < _)
      val runs = 1 + vs.sliding(2).count {
        case Seq(a, b) => b < a
        case _         => false
      }
      assert(lis.toLong * lds >= vs.length, "Erdos-Szekeres")
      assert(lis >= (vs.length + runs - 1) / runs, "pigeonhole")
      nCust += 1; nOrd += vs.length; runsTot += runs
      lisTot += lis; ldsTot += lds
    }
    val Array(r) = run("q480_sortedness").collect()
    assert(r.getLong(0) == nCust && r.getLong(1) == nOrd)
    assert(r.getLong(2) == runsTot, "runs bit-equal")
    assert(r.getLong(5) == lisTot, "LIS total bit-equal")
    assert(r.getLong(7) == ldsTot, "LDS total bit-equal")
    assert(r.getLong(9) == 0L && r.getLong(10) == 0L, "zero violations")
  }

  test("q481 weighted majority: mistake bound holds, fold consistent") {
    val rows = run("q481_weighted_majority").collect()
    assert(rows.length == 5)
    val m = rows.head.getLong(4)
    val best = rows.head.getLong(5)
    rows.foreach { r =>
      assert(r.getLong(4) == m && r.getLong(5) == best, "summary constant")
      assert(r.getLong(2) >= best, "best is the min")
      assert(r.getLong(3) >= 1L, "floor respected")
      assert(r.getLong(6) == (if (m <= r.getLong(2)) 1L else 0L))
    }
    assert(rows.map(_.getLong(2)).min == best)
    // M <= 2.5 m_best + 2 ln5 / (1/4) ~= 2.5 m_best + 12.9 (x8 exact form)
    assert(8L * m <= 20L * best + 104L, "Littlestone-Warmuth mistake bound")
  }

  test("q482 Elias-Fano: bit arithmetic re-derived per term") {
    val rows = run("q482_elias_fano").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, l, cl, ef) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(l == (63 - java.lang.Long.numberOfLeadingZeros(u / n)).toLong,
        "l = floor(log2(U div n))")
      assert(cl == (if (n * (1L << l) >= u) l else l + 1L), "ceil log")
      assert(ef == n * l + n + (u >> l), "EF size formula")
      assert(r.getLong(10) == 1L, "per-element guarantee")
      // dense lists: bitmap must win exactly when U <= EF bits
      assert(r.getLong(11) == (if (ef <= u) 1L else 0L))
    }
  }
}
