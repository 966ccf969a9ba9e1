package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the advisory-ops wave (q563, q564) — both changed
  * in round 13 (q563's two-pass ln magnitude guard, q564's
  * renormalized Erlang ladder), so the new math is pinned here,
  * including an accuracy property at the arrival rates where the old
  * ladder overflowed BIGINT.
  */
class AdvisoryOpsSpec extends AnyFunSuite {

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

  /** ln(v) via the q563 two-pass magnitude guard. */
  private def lnGuarded(v: Long): Long = {
    val sc = math.max(1L, v / 1000000L)
    lnE9(math.max(1L, v / sc), 1L) + lnE9(sc, 1L)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q563 learning curve: nested subsets, guarded axes and OLS slope " +
    "replayed bit-equal") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id".cast("long"),
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val train = docs.filter(_._1 % 10 != 0).map { case (id, toks) =>
      (java.lang.Long.parseLong(md5Hex(s"lc:$id").substring(0, 6), 16) % 10,
        toks)
    }
    val held = docs.filter(_._1 % 10 == 0).flatMap(_._2)
    val h = held.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ht = held.length.toLong
    val pts = Seq(1L, 2L, 4L, 8L).map { k =>
      val sub = train.filter(_._1 < k).flatMap(_._2)
      val ck = sub.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      val nn = sub.length.toLong
      val vv = ck.size.toLong
      var nll = BigInt(0)
      h.foreach { case (tok, hc) =>
        val c = ck.getOrElse(tok, 0L)
        val sc = math.max(1L, (nn + vv) / 1000000L)
        val hi = (nn + vv) / sc
        val lo = math.max(1L, (c + 1) / sc)
        nll += BigInt(hc) * lnE9(hi, lo)
      }
      val nllPerTok = (nll / ht).toLong
      val x = lnGuarded(nn)
      val z = lnGuarded(nllPerTok / 1000L)
      (k, nn, nllPerTok, x, z)
    }
    val np = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._4)).sum
    val sz = pts.map(p => BigInt(p._5)).sum
    val sxz = pts.map(p => BigInt(p._4) * p._5).sum
    val sxx = pts.map(p => BigInt(p._4) * p._4).sum
    val slope = sdiv((np * sxz - sx * sz) * 1000000, np * sxx - sx * sx).toLong
    val got = run("q563_learning_curve").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(10L, 20L, 40L, 80L))
    pts.foreach { case (k, nn, nllPerTok, _, _) =>
      assert(got(k * 10) == ((nn, nllPerTok, slope)),
        s"k=$k: replay ($nn,$nllPerTok,$slope) vs query ${got(k * 10)}")
    }
    // NOTE: no monotone-NLL assertion — at sf0.001 the four subsets are
    // a few thousand tokens and the held-out NLL wobbles within ~0.1%;
    // the bit-equal replay above is the certification.
  }

  /** The engine's renormalized Erlang ladder, replayed in pure Longs. */
  private def erlangLadder(aE6: Long, maxC: Int): (Seq[Long], Seq[Long]) = {
    var acc = Vector(1000000000L)
    for (k <- 1 to maxC) {
      val vraw = acc.last * aE6 / (k.toLong * 1000000L)
      acc = if (vraw > 1000000000L)
        acc.map(x => x * 1000000000L / vraw) :+ 1000000000L
      else acc :+ vraw
    }
    val sBelow = acc.indices.map(i => acc.take(i).sum)
    (acc, sBelow)
  }

  private def pWaitE6(aE6: Long, c: Long, t: Long, sBelow: Long): Long =
    if (aE6 >= c * 1000000L) 1000000L
    else {
      val num = BigInt(t) * (c * 1000000L) / (c * 1000000L - aE6)
      (num * 1000000 / (BigInt(sBelow) + num)).toLong
    }

  test("q564 Erlang-C: engine output replayed from the order counts") {
    import spark.implicits._
    val dns = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "cast(datediff(to_date(o_orderdate), date '1970-01-01') as bigint)"))
      .as[Long].collect()
    val cut = dns.max - 28
    val n28 = dns.count(_ > cut).toLong
    val aE6 = (n28 * 1000000L / 28) / 20
    val (ts, sb) = erlangLadder(aE6, 16)
    val got = run("q564_erlang_c").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == (1L to 16L).toSet)
    (1 to 16).foreach { c =>
      val sat = if (aE6 >= c * 1000000L) 1L else 0L
      val pw = pWaitE6(aE6, c, ts(c), sb(c))
      val want = (aE6, aE6 / c, sat, pw, if (pw <= 200000L) 1L else 0L)
      assert(got(c.toLong) == want, s"c=$c: replay $want vs ${got(c.toLong)}")
    }
    // monotone: more replicas never increases P(wait)
    val pws = (1 to 16).map(c => got(c.toLong)._4)
    assert(pws.zip(pws.tail).forall { case (a, b) => b <= a })
  }

  test("q562 Clarity: Okapi top-10, query LM and signed KL replayed") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id".cast("long"),
        org.apache.spark.sql.functions.expr("trim(text)").as("t"))
      .as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val queries = Map(1L -> Seq("spark", "window", "merge"),
      2L -> Seq("hash", "join"), 3L -> Seq("slow", "scan", "table"))
    val dl = docs.map { case (id, toks) => id -> toks.length.toLong }.toMap
    val nDocs = docs.length.toLong
    val sumDl = dl.values.sum
    val coll = docs.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val cn = coll.values.sum
    val want = queries.map { case (qid, terms) =>
      val tf = docs.flatMap { case (id, toks) =>
        terms.map(t => (t, id, toks.count(_ == t).toLong))
          .filter(_._3 > 0)
      }
      val df = tf.groupBy(_._1).map { case (t, v) => t -> v.length.toLong }
      val scores = tf.groupBy(_._2).map { case (id, rows) =>
        id -> rows.map { case (t, _, c) =>
          val idf = (1000000L * (2 * nDocs - 2 * df(t) + 1)) / (2 * df(t) + 1)
          val tfsat = (1000000L * 22 * c * sumDl) /
            (10 * c * sumDl + 3 * sumDl + 9 * dl(id) * nDocs)
          idf * tfsat / 1000000L
        }.sum
      }
      val top = scores.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(10).map(_._1).toSet
      val qtok = docs.filter(d => top(d._1)).flatMap(_._2)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val qn = qtok.values.sum
      var (vocab, sum) = (0L, BigInt(0))
      qtok.foreach { case (tok, qw) =>
        val p = math.max(1L, qw * 1000000L / qn)
        val q = math.max(1L, coll(tok) * 1000000L / cn)
        val lnr = lnE9(math.max(p, q), math.min(p, q))
        sum += BigInt(if (p >= q) p * lnr else -(p * lnr))
        vocab += 1
      }
      qid -> (vocab, sdiv(sum, 1000000).toLong)
    }
    val got = run("q562_clarity_score").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (q, w) =>
      assert(got(q) == w, s"query $q: replay $w vs query ${got(q)}") }
  }

  test("q564 renormalized ladder stays within ~1e-5 of exact Erlang-C " +
    "at the arrival rates where the old ladder overflowed BIGINT") {
    // exact reference in doubles (a^k/k! and the M/M/c waiting formula
    // are well-conditioned at these magnitudes; double error ~1e-15
    // relative, far under the asserted tolerance)
    for (aE6 <- Seq(54321L, 987654L, 12345678L, 234567890L, 5432109876L)) {
      val a = aE6 / 1e6
      val (ts, sb) = erlangLadder(aE6, 16)
      for (c <- 1 to 16 if aE6 < c * 1000000L) {
        val lad = (0 until c).map(k =>
          math.exp(k * math.log(a) - (1 to k).map(math.log(_)).sum)).sum
        val tc = math.exp(c * math.log(a) - (1 to c).map(math.log(_)).sum)
        val num = tc * c / (c - a)
        val exact = num / (lad + num)
        val gotPw = pWaitE6(aE6, c, ts(c), sb(c))
        assert(math.abs(gotPw - exact * 1e6) <= 10,
          f"a_e6=$aE6 c=$c: ladder $gotPw vs exact ${exact * 1e6}%.2f")
      }
    }
  }
}
