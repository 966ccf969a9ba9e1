package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and semantic invariants for the curation surface
  * (CurationQueries, q78-q84) — the 100-TB properties the sf0.01 hash
  * gate can't see: broadcasts where a side is vocabulary/benchmark-sized,
  * TakeOrdered instead of global sorts, deterministic sampling.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def executed(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q78 repetition: ratio bounded, flag consistent with threshold") {
    val rows = SparkEntry.queries("q78_repetition_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, ratio, rep) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(top >= 1 && top <= n)
      assert(ratio == top * 10000 / n)
      assert(rep == (ratio >= 2000))
    }
  }

  test("q79 canonical docs: one canonical per component, members partition the corpus") {
    val rows = SparkEntry.queries("q79_canonical_docs")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == nDocs, "members must partition the corpus")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach(r => assert(!r.isNullAt(1) && r.getLong(2) > 0))
  }

  test("q80 stratified rebalance: every stratum keeps exactly the min class size, deterministically") {
    val take = SparkEntry.queries("q80_stratified_rebalance")(spark, sf)
    val perLang = take.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = classes.values.min
    assert(perLang.keySet == classes.keySet)
    assert(perLang.values.forall(_ == m), s"expected $m per stratum, got $perLang")
    // pure function of doc_id: a second run selects the same docs
    val a = take.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = SparkEntry.queries("q80_stratified_rebalance")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("q81 tfidf: df side is broadcast (vocabulary-sized), ≤3 terms per doc") {
    val plan = executed("q81_tfidf_topk")
    assert(plan.contains("BroadcastHashJoin"), plan)
    val rows = SparkEntry.queries("q81_tfidf_topk")(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perDoc.forall(_ <= 3))
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(3))
    }
  }

  test("q82 contamination: probe side broadcast, join carries 32-hex hashes not gram text") {
    val plan = executed("q82_contamination")
    assert(plan.contains("BroadcastHashJoin"), plan)
    val rows = SparkEntry.queries("q82_contamination")(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(1) >= 1))
    // probe docs themselves (source src0) are never flagged
    val src0 = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !src0.contains(r.getLong(0))))
  }

  test("q83 histogram: closed bucket formula, partitions the corpus") {
    val rows = SparkEntry.queries("q83_token_histogram")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(b >= 0 && b <= 15)
      assert(lo <= hi)
      if (b < 15) assert(lo / 10 == b && hi / 10 == b)
    }
  }

  test("q84 phrase lift: top-k via TakeOrdered (no global sort), unigram sides broadcast") {
    val plan = executed("q84_phrase_lift")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    val rows = SparkEntry.queries("q84_phrase_lift")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 5), "min support")
    // descending by lift with total tie-break
    val lifts = rows.map(_.getLong(4)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }
}
