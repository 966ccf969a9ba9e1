package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the retrieval/mixture-ops wave (q531–q533). */
class RetrievalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q531 nprobe sweep: monotone, and probing all cells IS brute force") {
    val rows = run("q531_ivf_nprobe_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.sliding(2).foreach {
      case Array((_, c1, r1), (_, c2, r2)) =>
        assert(c2 >= c1, "more probes touch at least as many candidates")
        assert(r2 >= r1, "recall never drops as probes widen")
      case _ => ()
    }
    // nprobe = 8 probes every cell — the candidate set is the corpus,
    // so the "approximate" top-10 is exactly the exact top-10
    assert(rows.last._3 == 10000L, "full probe = exact recall")
  }

  test("q532 temperature: proportional weighting is exactly one epoch") {
    val rows = run("q532_mixture_temperature").collect()
    val prop = rows.find(_.getString(0) == "3_proportional").get
    // w_s = n_s ⟹ draws_s = n_s ⟹ every source sees exactly 1.0 epochs
    assert(prop.getLong(2) == 10000L && prop.getLong(3) == 10000L,
      "proportional epochs identity")
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), "max >= min epochs")
      assert(r.getLong(5) <= 1000000L, "share is an e6 proportion")
    }
  }

  test("q533 purity: cross-deletions bounded by non-canonical members") {
    val Array(r) = run("q533_cluster_purity").collect()
    val (nClusters, nDocs) = (r.getLong(0), r.getLong(1))
    assert(nDocs >= 2 * nClusters, "every real cluster has >= 2 docs")
    assert(r.getLong(6) <= nDocs - nClusters,
      "cross-source deletions are a subset of the deleted members")
    assert(r.getLong(3) <= nClusters && r.getLong(5) <= nClusters,
      "multi-source/lang cluster counts bounded")
  }
}
