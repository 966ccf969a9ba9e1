package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the corpus-health wave (CorpusHealthQueries,
  * q279-q282): the Gini matches the mean-absolute-difference definition,
  * the Lorenz curve is convex-monotone and consistent with the Gini's
  * sign, vocabulary growth conserves totals, and the dataset card's
  * shares sum to the whole.
  */
class CorpusHealthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q279 Gini: matches the O(n²) mean-absolute-difference definition") {
    val Array(r) = run("q279_gini_spend").collect()
    val (n, sx, giniE6) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(giniE6 >= 0 && giniE6 < 1000000)
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2n·Σx) — brute force on the small fixture
    val xs = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("c"))
      .collect().map(_.getLong(1))
    assert(xs.length.toLong == n && xs.sum == sx)
    var mad = BigInt(0)
    for (a <- xs; b <- xs) mad += (BigInt(a) - BigInt(b)).abs
    val expect = (mad * 1000000 / (BigInt(2) * BigInt(n) * BigInt(sx))).toLong
    assert(giniE6 == expect, s"rank-formula Gini $giniE6 != pairwise $expect")
  }

  test("q280 Lorenz: shares sum to total, cumulative share monotone convex") {
    val rows = run("q280_lorenz_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.last._5 == 1000000, "cumulative share at decile 10 must be exactly 1")
    // deciles ordered ascending by spend → per-decile share non-decreasing
    val shares = rows.map(_._4)
    assert(shares.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "ascending-spend deciles must have non-decreasing shares (Lorenz convexity)")
    val cum = rows.map(_._5)
    assert(cum.sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
    // bottom decile below uniform share, top above (non-degenerate fixture)
    assert(shares.head <= 100000 && shares.last >= 100000)
  }

  test("q281 vocab growth: totals conserve, marginal novelty non-negative") {
    val rows = run("q281_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._2).sum == rows.last._4, "cum_tokens at last slice = Σ n_tokens")
    assert(rows.map(_._3).sum == rows.last._5, "cum_types at last slice = Σ new_types")
    // Heaps saturation: first slice discovers the most new types
    assert(rows.head._3 == rows.map(_._3).max,
      "slice 0 must discover at least as many new types as any later slice")
    // cross-check the final vocabulary against a direct distinct count
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .agg(countDistinct("t")).collect()(0).getLong(0)
    assert(rows.last._5 == vocab, "cumulative vocabulary must equal corpus vocabulary")
  }

  test("q282 dataset card: token shares sum to 1e6-ish, dup rate bounded") {
    val rows = run("q282_dataset_card").collect()
    assert(rows.length == Tables.documents(spark, sf).select("source").distinct().count())
    val shareSum = rows.map(_.getLong(3)).sum
    // floor division: Σ shares ∈ (1e6 − |sources|, 1e6]
    assert(shareSum <= 1000000 && shareSum > 1000000 - rows.length)
    rows.foreach { r =>
      val (nDocs, topShare, dupDocs) = (r.getLong(1), r.getLong(7), r.getLong(8))
      assert(topShare > 0 && topShare <= 1000000)
      assert(dupDocs >= 0 && dupDocs < nDocs)
      assert(r.getLong(5) >= 1, "n_langs ≥ 1")
    }
  }
}
