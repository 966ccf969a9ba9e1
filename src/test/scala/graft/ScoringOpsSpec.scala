package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the scoring-ops wave (q543–q545). */
class ScoringOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q543 perplexity: buckets partition, cuts ordered, en scores best") {
    val rows = run("q543_lm_perplexity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean, t1, t2, h, m, t) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(h + m + t == n, "terciles partition the language")
      assert(t1 <= t2, "head cut <= mid cut")
      assert(mean >= 0 && t1 >= 0, "-ln p >= 0 for p <= 1")
      assert(h >= 1 && t >= 1, "nearest-rank terciles are non-degenerate")
    }
    // the reference LM is trained on 'en': its own language must score
    // the lowest mean log-perplexity — the CCNet premise
    val means = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    means.filter(_._1 != "en").foreach { case (lang, m) =>
      assert(means("en") < m, s"en must out-score $lang: $means")
    }
  }

  test("q544 pinball: replayed bit-equal from nearest-rank quantiles") {
    import spark.implicits._
    val nd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("g"),
        expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))").as("y"))
      .as[(Long, Long, Long)].collect()
    val cut = nd.map(_._2).max - 28
    def q(vs: Seq[(Long, Long)], num: Int, den: Int): Long = { // (y, dn)
      val s = vs.sortBy(identity)
      s((vs.length * num + den - 1) / den - 1)._1 // rank ceil(n·num/den)
    }
    val byG = nd.groupBy(_._1)
    val replay = byG.flatMap { case (g, rows) =>
      val train = rows.filter(_._2 <= cut)
      val hold = rows.filter(_._2 > cut)
      if (train.isEmpty || hold.isEmpty) None else {
        val byDow = train.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) =>
            val vs = rs.map(r => (r._3, r._2)).toSeq
            d -> (q(vs, 1, 10), q(vs, 1, 2), q(vs, 9, 10)) }
        val all = train.map(r => (r._3, r._2)).toSeq
        val fb = (q(all, 1, 10), q(all, 1, 2), q(all, 9, 10))
        var (s10, s50, s90, c90) = (0L, 0L, 0L, 0L)
        hold.foreach { case (_, dn, y) =>
          val (f10, f50, f90) = byDow.getOrElse(((dn % 7) + 7) % 7, fb)
          s10 += 1 * math.max(y - f10, 0) + 9 * math.max(f10 - y, 0)
          s50 += 5 * math.max(y - f50, 0) + 5 * math.max(f50 - y, 0)
          s90 += 9 * math.max(y - f90, 0) + 1 * math.max(f90 - y, 0)
          if (y <= f90) c90 += 1
        }
        val n = hold.length
        Some(g -> (n.toLong, s10 / n, s50 / n, s90 / n, c90 * 10000 / n))
      }
    }
    val got = run("q544_pinball_loss").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (g, v) =>
      assert(got(g) == v, s"nation $g: replay $v vs ${got(g)}") }
  }

  test("q545 RM3: expansion only adds score; seed docs tracked; ordered") {
    val rows = run("q545_rm3_expansion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 10)
    assert(rows.map(_._5).toSeq == (1L to 10L), "ranks 1..10")
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "scores descend")
      case _ => ()
    }
    rows.foreach { case (_, nTerms, _, wasSeed, _) =>
      assert(nTerms >= 1 && nTerms <= 8, "at most 3 original + 5 expansion")
      assert(wasSeed == 0L || wasSeed == 1L)
    }
    assert(rows.map(_._4).sum >= 1, "some seed doc survives re-ranking")
    // monotonicity: the original terms' contributions are unchanged by
    // expansion (same corpus stats), so any doc ranked by q221 can only
    // gain score under the expanded query
    val before = run("q221_bm25").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { case (doc, _, score, _, _) =>
      before.get(doc).foreach(b =>
        assert(score >= b, s"doc $doc lost score under expansion"))
    }
  }
}
