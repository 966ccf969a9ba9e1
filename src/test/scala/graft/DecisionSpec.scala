package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the decision wave (DecisionQueries,
  * q301-q304): held-out accuracy bounds, lift algebra, the isotonic
  * fit's monotonicity + PAV pool identities, and the RLE advisor's
  * prefix-distinct identity against a direct ordered-run count.
  */
class DecisionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q301 Markov eval: accuracy bounded, test mass positive for every state") {
    val rows = run("q301_markov_eval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, acc) =>
      assert(n > 0 && c >= 0 && c <= n)
      assert(acc == c * 10000 / n)
    }
  }

  test("q302 channel lift: rates bounded, lift recomputes from the rates") {
    val rows = run("q302_channel_lift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (withR, withoutR) = (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))
      assert(withR >= 0 && withR <= 10000)
      if (withoutR >= 0) assert(withoutR <= 10000)
      if (!r.isNullAt(4) && withoutR > 0)
        assert(r.getLong(4) == withR * 10000 / withoutR)
    }
  }

  test("q303 isotonic: fit is monotone, bounded by [0,1e9], and PAV-pools the raw rates") {
    val rows = run("q303_isotonic_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 10)
    val iso = rows.map(_._5)
    assert(iso.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "isotonic fit must be non-decreasing")
    iso.foreach(v => assert(v >= 0 && v <= 1000000000L))
    // the fit is a pooling of the raw rates: its range is within the raw range
    val raw = rows.map(_._4)
    assert(iso.min >= raw.min && iso.max <= raw.max)
    // exact-PAV replay on the 10 (n, pos) pairs via BigInt rationals
    val n = rows.map(_._2); val p = rows.map(_._3)
    val expect = (0 until 10).map { k =>
      (0 to k).map { i =>
        (k until 10).map { j =>
          val cp = (i to j).map(p).sum; val cn = (i to j).map(n).sum
          cp * 1000000000L / cn
        }.min
      }.max
    }
    assert(iso.sameElements(expect), "engine fit != driver-side max-min PAV replay")
  }

  test("q304 RLE advisor: prefix-distinct runs equal a direct sorted-run count") {
    val rows = run("q304_rle_advisor").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 3)
    // direct replay: sort driver-side and count value changes per column
    val data = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(identity)
    def runsOf[T](xs: Seq[T]): Long =
      if (xs.isEmpty) 0L else 1L + xs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
    val expect = Map(
      "1_status" -> runsOf(data.map(_._1).toSeq),
      "2_priority" -> runsOf(data.map(t => (t._1, t._2)).toSeq),
      "3_month" -> runsOf(data.map(identity).toSeq))
    rows.foreach { case (name, runs, nRows, ratio, wins) =>
      assert(runs == expect(name), s"$name: prefix-distinct $runs != sorted-run replay ${expect(name)}")
      assert(nRows == data.length.toLong)
      assert(ratio == runs * 10000 / nRows)
      assert(wins == (runs * 20 < nRows))
    }
  }
}
