package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the embedding-geometry wave
  * (VectorGeomQueries, q291-q294): Matryoshka overlap and ranks are
  * bounded and self-consistent, JL distortion concentrates near 1,
  * norm profiles obey min ≤ mean ≤ max, and silhouettes stay in
  * [-1, 1] with seeds scoring perfectly.
  */
class VectorGeomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q291 Matryoshka: overlap ≤ 5, prefix rank ≥ 1, rank 1 ⟺ prefix found the NN first") {
    val rows = run("q291_matryoshka_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, overlap, _, nnRank) =>
      assert(overlap >= 0 && overlap <= 5)
      assert(nnRank >= 1)
      // if the true NN ranks first under the prefix metric, the overlap
      // cannot be zero (the NN itself is in both top-5s)
      if (nnRank == 1) assert(overlap >= 1)
    }
  }

  test("q292 JL distortion: buckets non-empty, pair count conserved, distortion positive") {
    val rows = run("q292_jl_distortion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == 190, "C(20,2) pairs must all land in a bucket")
    rows.foreach { case (bucket, n, lo, hi) =>
      assert(n >= 1)
      assert(lo <= hi)
      assert(lo >= bucket * 2500 && hi < (bucket + 1) * 2500, "min/max inside bucket bounds")
      assert(lo > 0, "±1 projection of distinct vectors cannot be distortion-0 here")
    }
    // JL concentration: the mass-weighted mean distortion is within 3x of 1
    val meanE4 = rows.map(r => (r._3 + r._4) / 2 * r._2).sum / 190
    assert(meanE4 > 3333 && meanE4 < 30000, s"mean distortion $meanE4 e4 implausibly far from 1e4")
  }

  test("q293 norm profile: min ≤ mean ≤ max, outliers bounded") {
    val rows = run("q293_norm_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi, mean, out) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= mean && mean <= hi)
      assert(out >= 0 && out < n)
      assert(lo > 0, "zero-norm embedding would be a fixture bug")
    }
  }

  test("q294 silhouette: s ∈ [-1,1] scaled, seeds are perfectly separable, sizes conserve") {
    val rows = run("q294_silhouette").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length <= 8 && rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == total, "every vector must be assigned to exactly one cluster")
    rows.foreach { case (_, n, meanS, minS) =>
      assert(n >= 1)
      assert(meanS >= -10000 && meanS <= 10000)
      assert(minS >= -10000 && minS <= 10000)
      assert(minS <= meanS)
    }
    // each seed's own vector is at distance 0 from its centroid → s = 1
    // for it, so every cluster that contains its seed has max s = 10000;
    // the mean therefore cannot be the degenerate all-negative case
    assert(rows.map(_._3).max > 0, "at least one cluster must have positive mean separation")
  }
}
