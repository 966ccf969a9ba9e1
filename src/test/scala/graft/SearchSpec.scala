package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the relevance surface (SearchQueries,
  * q221-q223): BM25 score shape, Dirichlet smoothing floor, and an
  * exhaustive recomputation of the minimal proximity window.
  */
class SearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q221 BM25: ranks are 1..k, scores non-increasing, contribs positive") {
    val rows = run("q221_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._4).toSeq == (1L to rows.length).toSeq, "dense 1..k ranks")
    rows.sliding(2).foreach {
      case Array((_, _, s1, _), (_, _, s2, _)) => assert(s1 >= s2, "sorted desc")
      case _ =>
    }
    rows.foreach { case (_, nTerms, score, _) =>
      assert(nTerms >= 1 && nTerms <= 3)
      assert(score > 0, "matched docs score positive")
    }
  }

  test("q222 Dirichlet LM: every document scores (smoothing floor > 0)") {
    val rows = run("q222_dirichlet_lm").collect()
    assert(rows.length == math.min(20L,
      Tables.documents(spark, sf).count()), "smoothing scores ALL docs")
    rows.foreach { r =>
      assert(r.getDecimal(1).signum > 0, "Dirichlet floor keeps scores positive")
    }
  }

  test("q223 min window: matches brute-force span search on every returned doc") {
    val terms = Seq("spark", "window", "merge")
    val got = run("q223_min_window").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty, "probe terms co-occur in testdata")
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    got.foreach { case (docId, bestSpan) =>
      val pos = toks(docId).zipWithIndex.filter(t => terms.contains(t._1))
      // brute force: every pair of positions forming a window with all 3 terms
      val spans = for {
        (ta, pa) <- pos; (tb, pb) <- pos if pb >= pa
        w = pos.filter(t => t._2 >= pa && t._2 <= pb).map(_._1).toSet
        if terms.forall(w.contains)
      } yield pb - pa + 1
      assert(spans.nonEmpty, s"doc $docId must contain all terms")
      assert(spans.min == bestSpan, s"doc $docId: brute ${spans.min} vs $bestSpan")
    }
  }
}
