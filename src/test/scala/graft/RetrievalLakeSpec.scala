package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the retrieval/lakehouse wave
  * (RetrievalLakeQueries, q329-q332): the WAND bound and skip-safety
  * hold on every subset, varint coding is never worse than fixed for
  * in-range ids, merge-on-read reconstructs copy-on-write exactly, and
  * the as-of matrix obeys backward/forward/nearest dominance.
  */
class RetrievalLakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q329 WAND: upper bound holds and skipping is safe on every termset") {
    val rows = run("q329_wand_pruning").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"${r.getString(0)}: max realized score must be <= UB sum")
      assert(r.getBoolean(7), s"${r.getString(0)}: a skippable subset must hold no top-k doc")
    }
    // the full 3-term subset can never be skippable: it contains the top-1 doc
    val full = rows.find(_.getString(0).split(",").length == 3)
    full.foreach(r => assert(!r.getBoolean(5), "the complete termset holds the top doc"))
  }

  test("q330 postings: varint never beats 1 byte/posting nor loses to fixed-8") {
    val rows = run("q330_posting_compression").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(rows.length == 30)
    rows.foreach { case (tok, df, bv, bf, ratio) =>
      assert(bv >= df, s"$tok: at least one byte per posting")
      assert(bv <= bf, s"$tok: varint must not exceed fixed encoding for small ids")
      assert(ratio == bv * 10000 / bf)
    }
  }

  test("q331 deletion vectors: MoR == CoW per file, share ~8%") {
    val rows = run("q331_deletion_vectors").collect()
    assert(rows.length > 1, "fixture must span multiple files")
    var del = 0L; var tot = 0L
    rows.foreach { r =>
      assert(r.getBoolean(5), s"file ${r.getLong(0)}: row counts must match")
      assert(r.getBoolean(6), s"file ${r.getLong(0)}: checksums must match")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "rows = deleted + live")
      del += r.getLong(2); tot += r.getLong(1)
    }
    val share = del * 100 / tot
    assert(share >= 4 && share <= 12, s"md5 pick should land near 8%, got $share%")
  }

  test("q332 as-of: nearest dominates both sides, matched counts ordered sanely") {
    val m = run("q332_asof_matrix").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m.keySet == Set("backward", "forward", "nearest"))
    val n = m("backward")._1
    assert(m.values.forall(_._1 == n), "every semantics sees every probe")
    // nearest matches whenever either side matches
    assert(m("nearest")._2 >= m("backward")._2 && m("nearest")._2 >= m("forward")._2)
    // nearest total |delta| <= each one-sided total over the SHARED matched set
    // is not directly comparable (different matched sets); but nearest can
    // never have a larger per-probe delta than the smaller side when both
    // exist — certify via the sums only when matched counts coincide.
    if (m("nearest")._2 == m("backward")._2 && m("nearest")._2 == m("forward")._2) {
      assert(m("nearest")._3 <= m("backward")._3 && m("nearest")._3 <= m("forward")._3)
    }
  }
}
