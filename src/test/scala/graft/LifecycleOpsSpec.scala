package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Replay specs for the model-lifecycle flagships (q552, q553, q569,
  * q570) — the round-12 wave shipped spec-less (r12 verdict #4); these
  * pin the four-gate composition, the planted-clone certification, the
  * SRP bucket/clip rules, and the pre-vs-post gate recompose so a
  * perturbation of any gate/threshold/drop rule fails here, not just
  * at the end-to-end oracle hash.
  */
class LifecycleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

  /** Pure-Scala replica of the shared FixedLn kernel (ladder to 21). */
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

  /** Order-grain rows (g, dn, y, ok), re-derived exactly as the q552/
    * q570 fixture scans do. */
  private def odRows(): Array[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("g"),
        org.apache.spark.sql.functions.expr(
          "cast(datediff(to_date(o_orderdate), date '1970-01-01') as bigint)")
          .as("dn"),
        org.apache.spark.sql.functions.expr(
          "cast(round(o_totalprice * 100) as bigint)").as("y"),
        $"o_orderkey".cast("long").as("ok"))
      .as[(Long, Long, Long, Long)].collect()
  }

  final case class Decision(psi: Long, drift: Long, ts: Long, biased: Long,
    nTest: Long, wA: Long, maeC: Long, maeL: Long, maeE: Long,
    winner: String, retrain: Long, action: String, newVersion: Long)

  /** The full q552 decision (all four gates) replayed in BigInt. */
  private def replayDecision(od: Array[(Long, Long, Long, Long)]): Map[Long, Decision] = {
    val mx = od.map(_._2).max
    val (c1, c2) = (mx - 56, mx - 28)
    val psiByG = od.groupBy(_._1).flatMap { case (g, rows) =>
      val base = rows.filter(_._2 <= c2)
      val cur = rows.filter(_._2 > c2)
      if (base.isEmpty) None else {
        val ranked = base.sortBy(r => (r._3, r._4)).map(_._3)
        val n = ranked.length.toLong
        val edges = (1 to 9).map(i => (i * n + 9) / 10)
          .map(tr => ranked((tr - 1).toInt)).sorted
        def bins(ys: Seq[Long]): Map[Long, Long] =
          ys.groupBy(y => 1L + edges.count(_ < y))
            .map { case (b, g2) => b -> g2.length.toLong }
        val (bb, cb) = (bins(base.map(_._3).toSeq), bins(cur.map(_._3).toSeq))
        val allBins = (bb.keySet ++ cb.keySet).toSeq.sorted
        val (tp, tq) = (bb.values.sum, cb.values.sum)
        val nbins = allBins.length.toLong
        val psi = allBins.map { b =>
          val np = bb.getOrElse(b, 0L)
          val nq = cb.getOrElse(b, 0L)
          val p = math.max(1L, (np + 1) * 1000000L / (tp + nbins))
          val q = math.max(1L, (nq + 1) * 1000000L / (tq + nbins))
          math.abs(p - q) * lnE9(math.max(p, q), math.min(p, q))
        }.sum / 1000000L
        Some(g -> psi)
      }
    }
    val nd = od.groupBy(r => (r._1, r._2))
      .map { case ((g, dn), rows) => (g, dn, rows.map(_._3).sum) }.toSeq
    nd.groupBy(_._1).flatMap { case (g, rows) =>
      val fit = rows.filter(_._2 <= c1)
      val valW = rows.filter(r => r._2 > c1 && r._2 <= c2)
      val test = rows.filter(_._2 > c2).sortBy(_._2)
      if (fit.isEmpty || test.isEmpty || valW.isEmpty) None else {
        val fDow = fit.groupBy(r => ((r._2 % 7) + 7) % 7)
          .map { case (d, rs) => d -> rs.map(r => BigInt(r._3)).sum / rs.length }
        val fb = fit.map(r => BigInt(r._3)).sum / fit.length
        def fa(dn: Long): BigInt = fDow.getOrElse(((dn % 7) + 7) % 7, fb)
        var (ce, ca) = (BigInt(0), BigInt(0))
        test.foreach { case (_, dn, y) =>
          val e = BigInt(y) - fa(dn); ce += e; ca += e.abs }
        val ts = sdiv(ce * 1000000, ca.max(BigInt(1)))
        val maeA = valW.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / valW.length
        val maeB = valW.map(r => (BigInt(r._3) - fb).abs).sum / valW.length
        val wA = if (maeA + maeB == 0) BigInt(500000)
          else maeB * 1000000 / (maeA + maeB)
        val mc = test.map(r => (BigInt(r._3) - fa(r._2)).abs).sum / test.length
        val ml = test.map(r => (BigInt(r._3) - fb).abs).sum / test.length
        val me = test.map { r =>
          val fe = (wA * fa(r._2) + (BigInt(1000000) - wA) * fb) / 1000000
          (BigInt(r._3) - fe).abs }.sum / test.length
        val winner = if (mc <= me && mc <= ml) "champion"
          else if (me <= ml) "ensemble" else "level"
        val psi = psiByG(g)
        val drift = if (psi >= 100000000L) 1L else 0L
        val biased = if (ts.abs >= 500000) 1L else 0L
        val retrain = if (drift + biased > 0) 1L else 0L
        val action = if (retrain == 0) "keep"
          else if (winner == "champion") "refresh_champion"
          else s"promote_$winner"
        Some(g -> Decision(psi, drift, ts.toLong, biased, test.length.toLong,
          wA.toLong, mc.toLong, ml.toLong, me.toLong, winner, retrain,
          action, 1L + retrain))
      }
    }
  }

  test("q552 retrain pipeline: all four gates replayed bit-equal in BigInt") {
    val replay = replayDecision(odRows())
    val got = run("q552_retrain_pipeline").collect().map(r =>
      r.getLong(0) -> Decision(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getString(10), r.getLong(11), r.getString(12),
        r.getLong(13))).toMap
    assert(got.keySet == replay.keySet, "same nation set")
    replay.foreach { case (g, w) =>
      assert(got(g) == w, s"nation $g: replay $w vs query ${got(g)}") }
    assert(got.nonEmpty)
  }

  test("q570 ingest-gate recompose: pre/post decisions and changed flag " +
    "replayed; the drained week is exactly-once") {
    val od = odRows()
    val bcut = od.map(_._2).max - 7
    val pre = replayDecision(od.filter(_._2 <= bcut))
    val post = replayDecision(od)
    val got = run("q570_ingest_gate_pipeline").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7), r.getString(8),
        r.getLong(9), r.getLong(10))).toMap
    val want = (pre.keySet intersect post.keySet).map { g =>
      val (a, b) = (pre(g), post(g))
      g -> (a.psi, b.psi, a.ts, b.ts, a.retrain, b.retrain, a.action,
        b.action, b.newVersion,
        if (a.action != b.action || a.retrain != b.retrain) 1L else 0L)
    }.toMap
    assert(got.keySet == want.keySet, "same nation set")
    want.foreach { case (g, w) =>
      assert(got(g) == w, s"nation $g: replay $w vs query ${got(g)}") }
    // the recompose is live only if the drained week moves some gate —
    // on this corpus at least one nation must flip
    assert(got.values.exists(_._10 == 1L), "some decision changed post-drain")
  }

  // — SemDeDup shared fixtures: the planted-clone corpus in pure Scala —
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (vec_id, v6[]) corpus: embeddings at e6 ∪ planted clones. */
  private def semCorpusRows(): (Array[(Long, Array[Long])], Long) = {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf)
      .select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.map(x => math.round(x * 1000000)).toArray) }
    val off = math.max(1000000L, base.map(_._1).max + 1)
    val clones = base.filter(_._1 % 25 == 0).map { case (id, v6) =>
      val cid = id + off
      (cid, v6.zipWithIndex.map { case (x, p) =>
        x + (if (Integer.parseInt(md5Hex(s"$cid:$p").substring(0, 4), 16) % 2 == 0)
          1L else -1L)
      })
    }
    (base ++ clones, off)
  }

  private def cosineR6(a: Array[Long], b: Array[Long]): BigDecimal = {
    var (dot, na, nb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < a.length) {
      val (x, y) = (a(i).toDouble, b(i).toDouble)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    BigDecimal(dot / math.sqrt(na) / math.sqrt(nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("q553 SemDeDup: exactly the planted mass is caught, checksums close") {
    val (corpus, off) = semCorpusRows()
    val nPlantedWant = corpus.count(_._1 >= off).toLong
    val rows = run("q553_semdedup").collect()
    rows.foreach { r =>
      val (cid, nm, np, nd, npd, nk, ratio) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(npd == np, s"cell $cid: every planted clone dropped ($npd/$np)")
      assert(nd == np, s"cell $cid: NOTHING but planted dropped " +
        s"(natural ceiling cosine ~0.53 < tau): $nd vs $np")
      assert(nk == nm - nd && ratio == nd * 10000 / nm)
    }
    assert(rows.map(_.getLong(2)).sum == nPlantedWant,
      "total planted across cells == one clone per 25th vector")
    assert(rows.map(_.getLong(1)).sum == corpus.length.toLong,
      "membership partitions the union corpus")
    // kept ids = all ids minus dropped clones; clones never survive, so
    // the checksum sum telescopes to the plain embedding-id sum
    assert(rows.map(_.getLong(7)).sum == corpus.filter(_._1 < off).map(_._1).sum,
      "sum(keep_checksum) == sum(original vec_ids)")
  }

  test("q569 SemDeDup-LSH: buckets, bit rule, clip census and recall " +
    "replayed from scratch") {
    val (corpus, off) = semCorpusRows()
    val n = corpus.length.toLong
    val m = math.max(1L, (n + 124) / 125)
    val b = (3 to 16).find(bb => m <= (1L << bb)).getOrElse(16)
    // SRP buckets: proj_p = sum_i round(v6_i·1e6)·sign_{p,i}, exact longs
    val signs = (0 until 16).map(p =>
      graft.functions.VectorFunctions.planeSigns(p, 64).toArray)
    val bkts = corpus.map { case (id, v6) =>
      var bucket = 0L
      for (p <- 0 until 16) {
        var proj = BigInt(0)
        var i = 0
        while (i < 64) { proj += BigInt(v6(i)) * 1000000 * signs(p)(i); i += 1 }
        if (proj > 0) bucket |= (1L << p)
      }
      (id, v6, bucket % (1L << b))
    }
    val byBkt = bkts.groupBy(_._3)
    val nBuckets = byBkt.size.toLong
    val maxBucket = byBkt.values.map(_.length).max.toLong
    val candPairs = byBkt.values.map(v =>
      v.length.toLong * (v.length - 1) / 2).sum
    val dropped = byBkt.values.flatMap { mem =>
      val srt = mem.sortBy(_._1)
      for {
        j <- srt.indices; i <- 0 until j
        if cosineR6(srt(i)._2, srt(j)._2) >= BigDecimal("0.99")
      } yield srt(j)._1
    }.toSet
    val nPlanted = corpus.count(_._1 >= off).toLong
    val nPlantedDropped = dropped.count(_ >= off).toLong
    val keepChecksum = corpus.map(_._1).filterNot(dropped).sum
    val Array(r) = run("q569_semdedup_lsh").collect()
    val want = (n, nPlanted, b.toLong, nBuckets, maxBucket, candPairs,
      dropped.size.toLong, nPlantedDropped,
      nPlantedDropped * 10000 / math.max(nPlanted, 1L), keepChecksum)
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
      r.getLong(9))
    assert(got == want, s"replay $want vs query $got")
    assert(nPlantedDropped == nPlanted, "SRP recall on planted clones is " +
      "total at this scale (sign flips need |proj| <= 64e6 of a ~1e12 sum)")
  }
}
