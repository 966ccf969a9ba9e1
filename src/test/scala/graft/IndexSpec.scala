package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the retrieval/split/drift surface
  * (IndexQueries, q144/q145/q147/q148/q149): prefix filtering is
  * COMPLETE (set-equal to the naive all-pairs join it replaces), the
  * split manifest hits exact per-stratum quotas and tiles the corpus,
  * the KS statistic is a bounded rational, boolean retrieval returns
  * exactly the docs containing every term, and conversion latency
  * percentiles are ordered.
  */
class IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q144 prefix filter: set-equal to naive all-pairs exact Jaccard at tau=0.95") {
    val got = run("q144_prefix_filter_join")
      .select("doc_a", "doc_b", "j_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive oracle: every pair, no prefix pruning
    val tr = TextQueries.tokRows(spark, sf)
    val sizes = tr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = tr.select(col("doc_id").as("doc_a"), col("tok"))
      .join(tr.select(col("doc_id").as("doc_b"), col("tok")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("j_e6", expr("inter * 1000000 div (na + nb - inter)"))
      .filter(col("j_e6") >= 950000)
      .select("doc_a", "doc_b", "j_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, "prefix filtering must lose no qualifying pair")
    assert(got.nonEmpty, "fixture corpus should contain near-identical pairs")
  }

  test("q145 exact split: per-stratum quotas exact, manifest tiles the corpus") {
    val rows = run("q145_exact_split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length, "one row per doc")
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val n = g.length.toLong
      val byVariant = g.groupBy(_._4).view.mapValues(_.length.toLong).toMap
      assert(byVariant.getOrElse("train", 0L) == (n * 8) / 10, s"$lang train")
      assert(byVariant.getOrElse("val", 0L) == (n * 9) / 10 - (n * 8) / 10, s"$lang val")
      assert(byVariant.getOrElse("test", 0L) == n - (n * 9) / 10, s"$lang test")
      assert(g.map(_._3).sorted.toSeq == (1L to n).toSeq, s"$lang ranks dense")
    }
    val again = run("q145_exact_split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.sameElements(again), "md5 order must be run-stable")
  }

  test("q147 KS drift: statistic is a bounded rational; halves partition each type") {
    val rows = run("q147_ks_drift").collect()
    assert(rows.nonEmpty)
    val perType = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (t, n1, n2, num, e6) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n1 > 0 && n2 > 0, s"$t: both halves populated")
      assert(n1 + n2 == perType(t), s"$t: halves partition the type")
      assert(num >= 0 && num <= n1 * n2, s"$t: 0 <= D_num <= n1*n2")
      assert(e6 >= 0 && e6 <= 1000000, s"$t: D in [0,1]")
      assert(e6 == num * 1000000L / (n1 * n2), s"$t: e6 consistent with num")
    }
  }

  test("q148 boolean retrieval: exactly the docs containing all three top terms") {
    val got = run("q148_boolean_retrieval").collect().map(_.getLong(0)).toSet
    val tr = TextQueries.tokRows(spark, sf)
    val terms = tr.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(terms.length == 3)
    val expected = Tables.documents(spark, sf)
      .filter(terms.map(t => array_contains(graft.functions.TextFunctions.tokens(col("text")), t))
        .reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("q150 pagerank: ordered, above the damping floor, degree-consistent") {
    val rows = run("q150_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val pairs = FeatureQueries.dupPairsTable(spark, sf).select("doc_a", "doc_b")
    val deg = pairs.select(col("doc_a").as("d")).unionAll(pairs.select(col("doc_b").as("d")))
      .groupBy("d").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = deg.size.toLong
    assert(rows.length == math.min(50L, n))
    val floor = (15L * (1000000000000L / n)) / 100L
    rows.foreach { case (id, d, pr) =>
      assert(deg(id) == d, s"degree of $id")
      assert(pr >= floor, s"pr of $id under damping floor")
    }
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq, "sorted desc")
  }

  test("q151 simkey blocking: finds only true near-dups (subset of complete q144)") {
    val got = run("q151_simkey_blocking").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val complete = run("q144_prefix_filter_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "blocking should recover some near-identical pairs")
    assert(got.subsetOf(complete),
      "every verified blocked pair must be in the complete prefix-filter answer")
    // the recall dial: report it so a failing tightening shows the number
    info(s"sort-key blocking recall = ${got.size}/${complete.size}")
  }

  test("q152 langid confusion: cells tile the corpus and match per-lang totals") {
    val rows = run("q152_langid_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val langTotals = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._3).sum == langTotals.values.sum, "cells tile the corpus")
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._3).sum == langTotals(lang), s"$lang row total")
    }
    assert(rows.map(_._2).toSet.subsetOf(Set("en", "es", "de", "und")))
  }

  test("q153 attribution: every converting user's credits sum to exactly 10000 bp") {
    val rows = run("q153_position_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("us").as("fp_us"))
    val nUsers = e.filter(col("event_type").isin("click", "view"))
      .join(fp, Seq("user_id")).filter(col("us") <= col("fp_us"))
      .select("user_id").distinct().count()
    val nTouches = e.filter(col("event_type").isin("click", "view"))
      .join(fp, Seq("user_id")).filter(col("us") <= col("fp_us")).count()
    assert(rows.map(_._2).sum == nTouches, "touch count conserved")
    assert(rows.map(_._3).sum == 10000L * nUsers,
      "credit is conserved: 10000 bp per converting user, no rounding leak")
    assert(rows.map(_._1).toSet.subsetOf(Set("click", "view")))
  }

  test("q160 weighted jaccard: bounded, identical-set pairs stay 1.0, gap consistent") {
    val rows = run("q160_weighted_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nPairs = FeatureQueries.dupPairsTable(spark, sf).count()
    assert(rows.length == nPairs, "re-scores exactly the kept pair snapshot")
    rows.foreach { case (a, b, j, wj, gap) =>
      assert(wj >= 0 && wj <= 1000000, s"($a,$b) wj in [0,1]")
      assert(gap == j - wj, s"($a,$b) gap consistency")
      if (j == 1000000) assert(wj == 1000000, s"($a,$b) identical sets stay 1.0 weighted")
    }
  }

  test("q161 windowed funnel: stage counts monotone, click stage matches recount") {
    val r = run("q161_windowed_funnel").collect()(0)
    val (u, c, v, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u >= c && c >= v && v >= p, "funnel is monotone")
    assert(p >= 0 && c > 0)
    val clickers = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select("user_id").distinct().count()
    assert(c == clickers, "stage 1 = distinct clicking users")
  }

  test("q149 conversion latency: ordered percentiles over the recomputed cohort") {
    val r = run("q149_conversion_latency").collect()(0)
    val (n, p50, p90, p99) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fc = e.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("us").as("c_us"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(fc, Seq("user_id")).filter(col("us") >= col("c_us"))
      .select("user_id").distinct().count()
    assert(n == conv, "cohort = users with a purchase at/after their first click")
    assert(n > 0 && p50 >= 0 && p50 <= p90 && p90 <= p99)
  }
}
