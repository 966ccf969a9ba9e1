package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the tuning surface (TuneQueries,
  * q261-q263): the detected period really maximizes the
  * autocovariance, LSH collision mass grows as rows-per-band shrink,
  * and every fold manifest stratum is balanced within one.
  */
class TuneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q261 period: argmax confirmed by a driver-side ACF recomputation") {
    val rows = run("q261_period_detect").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (t, bestK, bestNum) =>
      val cells = daily(t).map(c => c._2 -> c._3).toMap
      val n = cells.size; val sx = cells.values.sum
      val cByT = cells.map { case (d, x) => d -> (BigInt(x) * n - sx) }
      val nums = (1 to 14).map { k =>
        k -> cByT.collect { case (d, c) if cByT.contains(d + k) => c * cByT(d + k) }.sum
      }
      val (kBest, numBest) = nums.minBy { case (k, num) => (-num, k) }
      assert(bestK == kBest, s"$t best period")
      assert(BigInt(bestNum.toBigInteger) == numBest, s"$t best numerator")
    }
  }

  test("q262 LSH tuning: candidate mass and catch probability both monotone in r") {
    val rows = run("q262_lsh_tuning").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (r, b, _, _) => assert(r * b == 8) }
    // fewer rows per band => more collisions AND higher catch probability
    rows.sliding(2).foreach {
      case Array((_, _, m1, p1), (_, _, m2, p2)) =>
        assert(m1 >= m2, "banding with shorter keys can only collide more")
        assert(p1 >= p2, "catch probability is monotone too")
      case _ =>
    }
    rows.foreach { case (_, _, _, p) => assert(p >= 0 && p <= 1000000) }
  }

  test("q263 k-fold manifest: every stratum balanced within one document") {
    val rows = run("q263_kfold_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
      val counts = rs.map(_._3)
      assert(counts.max - counts.min <= 1, s"$lang folds within +-1")
      rs.foreach(r => assert(r._4 == counts.max - counts.min))
    }
    assert(rows.map(_._3).sum == Tables.documents(spark, sf).count())
  }
}
