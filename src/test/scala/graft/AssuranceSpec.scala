package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the assurance wave (AssuranceQueries,
  * q337-q340): the bloom admits no false negatives and lands a sane
  * FPR, schema matching recovers the full rename map with the drop and
  * the add unmatched, snippets maximize in-window hits verifiably, and
  * the DP release replays its noise ladder.
  */
class AssuranceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q337 bloom: zero false negatives, measured FPR below 10%") {
    val Array(r) = run("q337_bloom_fpr").collect()
    val (nBuild, nProbe, nNon, nFp, nFn, fpr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nFn == 0, "a bloom filter can never produce a false negative")
    assert(nBuild + nNon == nProbe)
    assert(nBuild > 0 && nNon > 0)
    // 16384 bits / ~5% of docs: at sf0.001 (~50 keys) the theoretical FPR is
    // well under 1%; 10% is the generous ceiling that still catches a
    // broken hash (which lands near 100%).
    assert(fpr < 100000, s"measured FPR $fpr ppm is implausibly high")
  }

  test("q338 schema match: full rename map, drop and add both unmatched") {
    val rows = run("q338_schema_match").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getBoolean(4)))
    val matched = rows.filter(_._3).map(t => (t._1.get, t._2.get)).toMap
    assert(matched == Map(
      "o_orderkey" -> "order_id", "o_custkey" -> "customer_id",
      "o_orderpriority" -> "priority", "o_totalprice_c" -> "amount_c",
      "o_orderdate" -> "created_at"), "every rename must be recovered by stats alone")
    val unmatchedOld = rows.filter(r => !r._3 && r._1.isDefined).map(_._1.get)
    val unmatchedNew = rows.filter(r => !r._3 && r._2.isDefined).map(_._2.get)
    assert(unmatchedOld.sameElements(Seq("o_orderstatus")), "the dropped column")
    assert(unmatchedNew.sameElements(Seq("etl_batch")), "the added column")
  }

  test("q339 snippets: emitted window hit-count replays from the raw text") {
    val rows = run("q339_snippet_extract").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    val terms = Set("spark", "window", "merge")
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (docId, bestPos, bestHits, totHits) =>
      val toks = texts(docId)
      val hits = toks.map(t => if (terms(t)) 1L else 0L)
      assert(hits.sum == totHits, s"doc $docId: total hits replay")
      val windows = hits.indices.map(i =>
        hits.slice(i, math.min(i + 10, hits.length)).sum)
      assert(windows.max == bestHits, s"doc $docId: best window is the true max")
      assert(windows(bestPos.toInt) == bestHits, s"doc $docId: emitted start achieves it")
      assert(windows.indexOf(windows.max) == bestPos.toInt,
        s"doc $docId: ties go to the earliest offset")
      assert(bestHits >= 2 && totHits >= 2)
    }
  }

  test("q340 DP release: noise replays from the ladder, post-processing >= 0") {
    val rows = run("q340_dp_release").collect()
    assert(rows.length == 5)
    val cum = Seq(333333L -> 0, 500000L -> 1, 666667L -> -1, 750000L -> 2,
      833333L -> -2, 875000L -> 3, 916667L -> -3, 937500L -> 4, 958333L -> -4,
      968750L -> 5, 979167L -> -5, 989584L -> 6)
    rows.foreach { r =>
      val (prio, trueN, noise, released) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp-v1#$prio".getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5hex, 16) % 1000000
      val expected = cum.find(u < _._1).map(_._2).getOrElse(-6)
      assert(noise == expected, s"$prio: ladder must replay (u=$u)")
      assert(released == math.max(trueN + noise, 0L))
      assert(r.getBoolean(4) == (math.abs(noise) == 6))
    }
  }
}
