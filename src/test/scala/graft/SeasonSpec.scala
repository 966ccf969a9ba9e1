package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the seasonal-state and sequence wave
  * (SeasonQueries, q369-q372): a driver BigInt replay of the
  * Holt–Winters fold, subsequence monotonicity, layout depth ordering,
  * and MASE's scale-free recomputation.
  */
class SeasonSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q369 Holt-Winters: driver BigInt replay matches the list-state fold") {
    import org.apache.spark.sql.functions._
    val rows = run("q369_holt_winters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    val daily = Tables.orders(spark, sf)
      .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val lo = daily.head._1; val hi = daily.last._1
    val m = daily.toMap
    val ys = (lo to hi).map(d => m.getOrElse(d, 0L))
    var l = BigInt(ys.head); var b = BigInt(0); var s = Vector.fill(7)(BigInt(0))
    for (y <- ys.tail) {
      val lp = (2 * (y - s(0)) + 8 * (l + b)) / 10
      val bp = ((lp - l) + 9 * b) / 10
      val s0p = (3 * (y - lp) + 7 * s(0)) / 10
      l = lp; b = bp; s = s.tail :+ s0p
    }
    rows.foreach { case (h, lv, tr, se, f) =>
      assert(lv == l.toLong, s"h=$h level")
      assert(tr == b.toLong, s"h=$h trend")
      assert(se == s(((h - 1) % 7).toInt).toLong, s"h=$h season slot")
      assert(f == lv + h * tr + se)
    }
  }

  test("q370 PrefixSpan: subsequence supports respect prefix/suffix monotonicity") {
    val rows = run("q370_prefixspan").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, _, _, s3, sAb, sBc) =>
      assert(s3 >= 1)
      assert(sAb >= s3, "users with a<b<c all have a<b")
      assert(sBc >= s3, "users with a<b<c all have b<c (from the first b)")
    }
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q371 clustering depth: date-clustered layout is tighter than shuffled") {
    val rows = run("q371_clustering_depth").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val byLayout = rows.map(x => x._1 -> x).toMap
    assert(byLayout.keySet == Set("clustered", "shuffled"))
    val (cl, sh) = (byLayout("clustered"), byLayout("shuffled"))
    assert(cl._2 == 16 && sh._2 == 16)
    // every file overlaps itself — depth >= 1.0
    assert(cl._4 >= 10000 && sh._4 >= 10000)
    assert(sh._4 > cl._4,
      s"md5-shuffled layout must overlap more (${sh._4}) than date-clustered (${cl._4})")
    // the shuffled layout spans everything: all 16x16 pairs overlap
    assert(sh._3 == 256)
  }

  test("q372 MASE: scale-free ratio recomputes, every nation present") {
    val rows = run("q372_mase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (nat, nTest, scale, mae, mase) =>
      assert(nTest > 0 && scale >= 0)
      assert(mase == mae * 10000 / math.max(scale, 1), s"nation $nat")
    }
  }
}
