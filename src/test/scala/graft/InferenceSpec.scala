package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the inference-quality wave (q425-q428):
  * modularity dominance, Wilson bound properties, BH step-up
  * monotonicity, and Gini gain bounds.
  */
class InferenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q425 modularity: CC beats the random partition, Q in range") {
    val Array(r) = run("q425_modularity").collect()
    assert(r.getLong(6) == 1L, "CC modularity must beat random")
    val (qcc, qrand) = (r.getLong(4), r.getLong(5))
    assert(qcc > qrand)
    assert(qcc <= 1000000 && qcc >= -500000, "Q in [-1/2, 1]")
    assert(r.getLong(1) > 0, "the dup graph has edges")
    assert(r.getLong(2) <= r.getLong(0), "communities <= nodes")
  }

  test("q426 Wilson: LB never exceeds the point estimate, ranks permute") {
    val rows = run("q426_wilson_ranking").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3),
        "the lower bound sits at or below the rate")
      assert(r.getLong(4) >= -100, "LB is nonnegative up to 1-ulp truncation")
    }
    val n = rows.length
    assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to n).toSeq,
      "p-ranks are a permutation")
    assert(rows.map(_.getLong(6)).sorted.toSeq == (1L to n).toSeq,
      "LB-ranks are a permutation")
  }

  test("q427 BH: rejection set is rank-downward-closed and superset-safe") {
    val rows = run("q427_bh_fdr").collect()
      .map(r => (r.getLong(5), r.getLong(4), r.getLong(6), r.getLong(7)))
    // downward closure: if rank r rejected, every smaller rank rejected
    val rejected = rows.filter(_._3 == 1L).map(_._1)
    if (rejected.nonEmpty) {
      val kmax = rejected.max
      rows.foreach { case (rnk, _, bh, _) =>
        assert(bh == (if (rnk <= kmax) 1L else 0L))
      }
    }
    // BH at alpha rejects no more than naive alpha on the SAME p-values
    // only when m > 1 shrinks thresholds: every BH rejection has p <= alpha
    rows.filter(_._3 == 1L).foreach { case (_, p, _, naive) =>
      assert(p <= 50000L && naive == 1L,
        "a BH rejection is always a naive rejection at the same alpha")
    }
  }

  test("q428 Gini: gains nonnegative up to truncation, parent in range") {
    val rows = run("q428_gini_split").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 500000,
        "binary Gini is at most 1/2")
      assert(r.getLong(5) >= 0)
      // splitting never increases impurity (up to 25-term truncation slack)
      assert(r.getLong(6) >= -100, s"gain for ${r.getString(0)}")
    }
    // the feature that determines nothing cannot beat the informative ones
    val gains = rows.map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(gains.values.max == rows.head.getLong(6), "sorted by gain desc")
  }
}
