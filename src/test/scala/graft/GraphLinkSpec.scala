package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the graph-link wave (GraphLinkQueries,
  * q287-q290): predicted links are genuinely non-edges with shared
  * neighbors, LPA conserves nodes and refines no finer than CC allows,
  * embeddedness is bounded by min degree, and modularity obeys its
  * analytic bounds.
  */
class GraphLinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val pairs = FeatureQueries.dupPairsTable(spark, sf)
    .select("doc_a", "doc_b").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q287 link prediction: results are non-edges whose CN count replays") {
    val nbrs = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = run("q287_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "the dup graph must produce at least one two-hop non-edge")
    rows.foreach { case (a, b, cn) =>
      assert(a < b)
      assert(!pairs.contains((a, b)), s"($a,$b) is an existing edge")
      val expect = (nbrs.getOrElse(a, Set.empty) & nbrs.getOrElse(b, Set.empty)).size.toLong
      assert(cn == expect, s"($a,$b): CN $cn != replay $expect")
      assert(cn >= 1)
    }
    // descending with tiebreaks
    assert(rows.sliding(2).forall(w => w.length < 2 || w(0)._3 >= w(1)._3))
  }

  test("q288 LPA: node count conserved; no community crosses a CC component") {
    val rows = run("q288_label_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2))
    assert(rows.map { case (sz, n) => sz * n }.sum == nodes.size.toLong,
      "Σ comm_size·n_comms must equal the node universe")
    rows.foreach { case (sz, n) => assert(sz >= 1 && n >= 1) }
  }

  test("q289 embeddedness: cn ≤ min(deg)-1 for edges, ratio bounded") {
    val rows = run("q289_edge_embeddedness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val deg = pairs.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { case (a, b, cn, union, emb) =>
      assert(pairs.contains((a, b)) || pairs.contains((b, a)), "rows must be edges")
      assert(cn <= math.min(deg(a), deg(b)) - 1,
        "common neighbors bounded by the smaller endpoint's other-degree")
      assert(union >= cn)
      assert(emb >= 0 && emb <= 1000000)
    }
  }

  test("q290 modularity: bounds and identity hold") {
    val Array(r) = run("q290_modularity").collect()
    val (m, nComms, internal, qE9) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m == pairs.size.toLong)
    assert(internal <= m)
    assert(nComms >= 1)
    // Q ∈ [−½, 1); floor-per-community can only lower it slightly
    assert(qE9 >= -500000000L - nComms && qE9 < 1000000000L)
  }
}
