package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the epoch wave (EpochQueries, q299-q300):
  * generalization monotonicity on the anonymity ladder, and the epoch
  * build's conservation + stage-dominance identities.
  */
class EpochSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q299 ladder: coarser levels are monotone safer, chosen is the first safe level") {
    val rows = run("q299_anonymity_ladder").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
      .sortBy(_._1)
    assert(rows.map(_._1) sameElements Array("1_day", "2_week", "3_month"))
    // generalization monotone: fewer groups, larger minimum, less risk
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2, "group count must shrink")
    assert(rows(0)._3 <= rows(1)._3 && rows(1)._3 <= rows(2)._3, "min group must grow")
    assert(rows(0)._5 >= rows(1)._5 && rows(1)._5 >= rows(2)._5, "rows at risk must shrink")
    val chosenIdx = rows.indexWhere(_._6.contains(true))
    if (chosenIdx >= 0) {
      assert(rows(chosenIdx)._4 == 0, "chosen level must have zero groups below k")
      rows.take(chosenIdx).foreach(r => assert(r._4 > 0, "chosen must be the FIRST safe level"))
    } else assert(rows.forall(_._4 > 0), "no chosen level ⟺ every level has risk")
  }

  test("q300 epoch build: manifest conserves the surviving docs, deciles cut the mass") {
    val rows = run("q300_epoch_build").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (shard, decile, n, toks) =>
      assert(shard >= 0 && shard <= 7)
      assert(decile >= 1 && decile <= 10)
      assert(n >= 1 && toks >= 20 * n, "every kept doc has ≥ 20 tokens")
    }
    // shards near-equal in doc count (serpentine property, coarse check)
    val byShard = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byShard.values.max - byShard.values.min <= 1)
    // the eval set must not leak into the epoch: kept docs < corpus
    val total = rows.map(_._3).sum
    val corpus = Tables.documents(spark, sf).count()
    assert(total < corpus, "eval exclusion + dedup must drop something")
    // decile 1 holds the longest docs: its mean length ≥ decile 10's
    val d1 = rows.filter(_._2 == 1)
    val d10 = rows.filter(_._2 == 10)
    if (d1.nonEmpty && d10.nonEmpty) {
      val m1 = d1.map(_._4).sum / d1.map(_._3).sum
      val m10 = d10.map(_._4).sum / d10.map(_._3).sum
      assert(m1 >= m10, "descending-difficulty rank puts long docs in decile 1")
    }
  }
}
