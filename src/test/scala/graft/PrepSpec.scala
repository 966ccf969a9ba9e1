package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the preparation surface (PrepQueries,
  * q244-q247): canonicalization only collapses (never splits),
  * k-NN verdicts beat chance, the feature matrix has no leakage and
  * recomputes, and quantile normalization preserves rank order.
  */
class PrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q244 email normalize: canonical <= raw; domain case unified") {
    val rows = run("q244_email_normalize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (domain, _, raw, canon, collapse) =>
      assert(domain == domain.toLowerCase)
      assert(canon <= raw, "normalization only merges identities")
      assert(collapse == (raw - canon) * 10000 / raw)
    }
    // the three raw domain spellings collapse to exactly two canonical domains
    assert(rows.map(_._1).toSet == Set("example.com", "mail.example.com"))
  }

  test("q245 kNN: brute-force recomputation confirms every probe's vote") {
    val rows = run("q245_knn_classify").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(2).toLong,
        r.getSeq[Float](1).map(f => math.round(f.toDouble * 1000000)).toArray)
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    rows.foreach { case (qId, qLabel, pred, correct) =>
      val (_, lbl, q6) = byId(qId)
      assert(lbl == qLabel)
      val neigh = vecs.filter(_._1 != qId).map { case (id, nl, v6) =>
        val d2 = q6.zip(v6).map { case (a, b) => val d = a - b; d * d }.sum
        (d2, id, nl)
      }.sortBy(t => (t._1, t._2)).take(5)
      val vote = neigh.groupBy(_._3).view.mapValues(_.size).toSeq
        .maxBy { case (l, n) => (n, -l) }._1
      assert(vote == pred, s"probe $qId vote")
      assert(correct == (pred == qLabel))
    }
  }

  test("q246 feature matrix: windows recompute; label is strictly future") {
    val rows = run("q246_feature_matrix").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    rows.foreach { case (t, day, y6, lag1, lag7, ma7, label) =>
      val series = daily(t)
      val i = series.indexWhere(_._2 == day)
      assert(series(i)._3 == y6)
      assert(series(i - 1)._3 == lag1 && series(i - 7)._3 == lag7)
      assert(series(i + 1)._3 == label, "label is the NEXT cell — never current")
      assert(ma7 == series.slice(i - 6, i + 1).map(_._3).sum / 7)
    }
  }

  test("q247 quantile normalize: monotone in rank; ref is the cross-type mean") {
    val rows = run("q247_quantile_normalize").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // within a type, the normalized value is monotone in the raw rank
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.sortBy(_._3).sliding(2).foreach {
        case Array((_, _, _, r1, _), (_, _, _, r2, _)) => assert(r1 <= r2)
        case _ =>
      }
    }
    // each rank's reference value equals the floor-mean over the types at that rank
    rows.groupBy(_._3).foreach { case (_, rs) =>
      val ref = rs.head._4
      assert(rs.forall(_._4 == ref), "one reference value per rank")
      assert(ref == rs.map(_._2).sum / rs.length)
      assert(rs.forall(_._5 == rs.length))
    }
  }
}
