package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the corpus-ops wave (q554–q557): KL mixture drift,
  * Jensen–Shannon divergence, Dunning G² keyness, and the Gopher rule
  * census (including the round-13 n<2 bigram guard).
  */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

  private def lnE9(hi: Long, lo: Long): Long = {
    val r = hi * 1000000000L / lo
    val k = (21 to 1 by -1).find(kk => r >= (1L << kk) * 1000000000L).getOrElse(0)
    val r2 = r / (1L << k)
    val z = (r2 - 1000000000L) * 1000000000L / (r2 + 1000000000L)
    val z2 = z * z / 1000000000L
    val z3 = z * z2 / 1000000000L
    val z5 = z3 * z2 / 1000000000L
    val z7 = z5 * z2 / 1000000000L
    val z9 = z7 * z2 / 1000000000L
    val z11 = z9 * z2 / 1000000000L
    val z13 = z11 * z2 / 1000000000L
    k * 693147181L + 2 * (z + z3 / 3 + z5 / 5 + z7 / 7 + z9 / 9 + z11 / 11 + z13 / 13)
  }

  private def docRows(): Array[(Long, String, String, Seq[String])] = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .select($"doc_id".cast("long"), $"lang", $"source",
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(Long, String, String, String)].collect()
      .map { case (id, l, s, t) => (id, l, s, t.split("\\s+").toSeq) }
  }

  test("q554 KL mixture: per-source token-mass shares and signed terms") {
    val docs = docRows()
    val bySrc = docs.groupBy(_._3)
    val na = docs.filter(_._1 % 2 == 0).map(_._4.length.toLong).sum
    val nb = docs.filter(_._1 % 2 != 0).map(_._4.length.toLong).sum
    val want = bySrc.map { case (src, rows) =>
      val cr = rows.filter(_._1 % 2 == 0).map(_._4.length.toLong).sum
      val cc = rows.filter(_._1 % 2 != 0).map(_._4.length.toLong).sum
      val q = math.max(1L, cr * 1000000L / na)
      val p = math.max(1L, cc * 1000000L / nb)
      val lnr = lnE9(math.max(p, q), math.min(p, q))
      val term = sdiv(BigInt(if (p >= q) p * lnr else -(p * lnr)), 1000000).toLong
      src -> (cr, cc, q, p, term)
    }
    val got = run("q554_kl_mixture").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (s, w) =>
      assert(got(s) == w, s"source $s: replay $w vs query ${got(s)}") }
  }

  test("q555 JSD: bounded by ln 2 and replayed per language") {
    val docs = docRows()
    val want = docs.groupBy(_._2).map { case (lang, rows) =>
      val cnt = scala.collection.mutable.Map.empty[String, (Long, Long)]
      rows.foreach { case (id, _, _, toks) =>
        toks.foreach { t =>
          val (a, b) = cnt.getOrElse(t, (0L, 0L))
          cnt(t) = if (id % 2 == 0) (a + 1, b) else (a, b + 1)
        }
      }
      val na = cnt.values.map(_._1).sum
      val nb = cnt.values.map(_._2).sum
      var (stp, stq) = (BigInt(0), BigInt(0))
      cnt.values.foreach { case (ca, cb) =>
        val p = math.max(1L, ca * 1000000L / na)
        val q = math.max(1L, cb * 1000000L / nb)
        val m = math.max(1L, (p + q) / 2)
        val lpm = lnE9(math.max(p, m), math.min(p, m))
        val lqm = lnE9(math.max(q, m), math.min(q, m))
        stp += BigInt(if (p >= m) p * lpm else -(p * lpm))
        stq += BigInt(if (q >= m) q * lqm else -(q * lqm))
      }
      val jsd = sdiv(stp + stq, 2000000).toLong
      lang -> (na, nb, cnt.size.toLong, jsd,
        if (jsd <= 693147181L) 1L else 0L)
    }
    val got = run("q555_js_divergence").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (l, w) =>
      assert(got(l) == w, s"lang $l: replay $w vs query ${got(l)}") }
    assert(got.values.forall(_._5 == 1L), "JSD <= ln 2 everywhere")
  }

  test("q556 Dunning G2: top-20 keyness list replayed in order") {
    val docs = docRows()
    val cnt = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (id, _, _, toks) =>
      toks.foreach { t =>
        val (a, b) = cnt.getOrElse(t, (0L, 0L))
        cnt(t) = if (id % 2 == 0) (a + 1, b) else (a, b + 1)
      }
    }
    val na = cnt.values.map(_._1).sum
    val nb = cnt.values.map(_._2).sum
    def leg(obs: Long, tot: Long, ca: Long, cb: Long): Long = {
      val num = math.max(1L, obs * (na + nb))
      val den = math.max(1L, tot * (ca + cb))
      val sc = math.max(1L, math.max(num, den) / 1000000L)
      val hi = math.max(num, den) / sc
      val lo = math.max(1L, math.min(num, den) / sc)
      val l = lnE9(hi, lo)
      if (obs == 0) 0L else if (num >= den) obs * l else -(obs * l)
    }
    val want = cnt.toSeq.collect { case (tok, (ca, cb)) if ca + cb >= 10 =>
      val g2 = 2 * (leg(ca, na, ca, cb) + leg(cb, nb, ca, cb))
      (tok, ca, cb, g2, if (ca * nb >= cb * na) "a" else "b")
    }.sortBy(t => (-t._4, t._1)).take(20)
    val got = run("q556_dunning_g2").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == want, s"replay\n$want\nvs query\n$got")
  }

  test("q557 Gopher rules: per-doc rules and per-language census " +
    "replayed (incl. the n<2 guard path)") {
    val stop = Set("the", "a", "of", "and", "to", "in")
    val docs = docRows()
    val perDoc = docs.map { case (_, lang, _, toks) =>
      val n = toks.length.toLong
      val mwl = toks.map(_.length.toLong).sum * 100 / n
      val nstop = toks.toSet.intersect(stop).size
      val topp: Option[Long] = if (n >= 2) {
        val pairs = toks.sliding(2).map(_.mkString(" ")).toSeq
        Some(pairs.groupBy(identity).values.map(_.length.toLong).max)
      } else None
      val fLen = if (n < 50 || n > 100000) 1L else 0L
      val fMwl = if (mwl < 300 || mwl > 1000) 1L else 0L
      val fStop = if (nstop < 2) 1L else 0L
      val fRep = topp match {
        case Some(t) if t * 2 * 10000 / n > 2000 => 1L
        case _ => 0L
      }
      val pass = if (fLen + fMwl + fStop + fRep == 0) 1L else 0L
      (lang, n, fLen, fMwl, fStop, fRep, pass)
    }
    val want = perDoc.groupBy(_._1).map { case (lang, rows) =>
      lang -> (rows.length.toLong, rows.map(_._3).sum, rows.map(_._4).sum,
        rows.map(_._5).sum, rows.map(_._6).sum, rows.map(_._7).sum,
        rows.filter(_._7 == 1L).map(_._2).sum * 10000 / rows.map(_._2).sum)
    }
    val got = run("q557_gopher_rules").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (l, w) =>
      assert(got(l) == w, s"lang $l: replay $w vs query ${got(l)}") }
  }
}
