package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the training-mixture wave (MixtureQueries,
  * q267-q270): the SpaceSaving audit's booleans are in the GUARANTEED
  * regime (not accidentally true), the ablation ledger conserves mass,
  * the curriculum manifest tiles positions round-robin, and the mined
  * hard pairs match a brute-force recompute.
  */
class MixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q267 spacesaving: all guarantees hold AND the top-5 are in the guaranteed regime") {
    val rows = run("q267_spacesaving_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(rows.length == 5)
    rows.foreach { case (tok, _, inSketch, bracket, errOk) =>
      assert(inSketch, s"$tok missing from sketch")
      assert(bracket, s"$tok est bracket violated")
      assert(errOk, s"$tok error bound violated")
    }
    // membership is only GUARANTEED for items with true count > n/k —
    // assert the fixture keeps the audit in that regime (k = 256), so a
    // merge-order change can never flip the booleans
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val n = toks.count()
    rows.foreach { case (tok, cnt, _, _, _) =>
      assert(cnt > n / 256, s"$tok exact count $cnt not > n/k = ${n / 256} — audit outside guarantee")
    }
    // order: exact counts non-increasing
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q267 kernel: sketch of a small exact stream is exact") {
    import spark.implicits._
    // fewer distinct items than k → SpaceSaving degenerates to exact counts
    val df = Seq.tabulate(1000)(i => s"item${i % 7}").toDF("s")
      .repartition(8) // force real partial-merge traffic
    val out = df.agg(expr("spacesaving(s, 256)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 7)
    out.foreach { case (item, est, err) =>
      val expect = 1000 / 7 + (if (item.stripPrefix("item").toInt < 1000 % 7) 1 else 0)
      assert(est == expect, s"$item est $est != exact $expect")
      assert(err == 0, s"$item err $err != 0 for an untruncated sketch")
    }
  }

  test("q268 ablation: mass conserved, deltas recompute, full mean constant") {
    val rows = run("q268_source_ablation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val d = Tables.documents(spark, sf)
      .select(col("source"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("source"), size(col("toks")).cast("long").as("nt"),
        size(array_distinct(col("toks"))).cast("long").as("ny"))
      .filter(col("nt") > 0)
      .withColumn("ttr", expr("ny * 10000 div nt"))
    val nDocs = d.count()
    assert(rows.map(_._2).sum == nDocs, "every doc in exactly one source row")
    assert(rows.map(_._3).distinct.length == 1, "full-corpus mean identical on every row")
    // recompute one source's exclusion mean independently
    val (src, srcDocs, _, exclMean, delta) = rows.head
    val tot = d.agg(sum("ttr"), count(lit(1))).collect()(0)
    val srcAgg = d.filter(col("source") === src).agg(sum("ttr")).collect()(0)
    val expectExcl = (tot.getLong(0) - srcAgg.getLong(0)) / (tot.getLong(1) - srcDocs)
    assert(exclMean == expectExcl, "exclusion mean recomputes")
    assert(delta == exclMean - rows.head._3)
  }

  test("q269 curriculum: deciles 1..10, positions tile 1..N, round-robin head") {
    val rows = run("q269_curriculum_manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == n, "every doc placed once")
    // round-robin: position d is decile d's rank-1 example, so every
    // decile's first position equals its decile number
    rows.foreach { case (d, _, first, last, _) =>
      assert(first == d, s"decile $d first_pos $first != $d (round-robin head)")
      assert(last <= n)
    }
    assert(rows.map(_._4).max == n, "the final position is the corpus size")
    // decile sizes differ by at most 1 (exact NTILE)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
  }

  test("q271 RRF: fused order consistent with its two input rankings") {
    val fused = run("q271_rrf_fusion").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(fused.length == 10)
    assert(fused.map(_._1).toSeq == (1L to 10L), "dense fused ranks")
    // fused score recomputes from the member ranks
    fused.foreach { case (_, _, ra, rb, s) =>
      val expect = ra.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rb.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(s == expect, "RRF score recomputes from member ranks")
    }
    // scores non-increasing in fused rank
    assert(fused.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // a doc ranked #1 by both rankers (if any doc is in both lists at 1) must fuse first;
    // weaker invariant that always holds: the fused #1 is in at least one member list
    assert(fused.head._3.nonEmpty || fused.head._4.nonEmpty)
  }

  test("q272 consistent hashing: balance before/after, remap near 1/(n+1)") {
    val rows = run("q272_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_._1).toSeq == (0L to 4L))
    assert(rows.map(_._2).sum == n, "every doc owned before")
    assert(rows.map(_._3).sum == n, "every doc owned after")
    assert(rows.find(_._1 == 4L).get._2 == 0, "node 4 owns nothing before it joins")
    val moved = rows.map(_._4).sum
    // consistent hashing: ONLY keys that node 4 captures move (owner can
    // never change between surviving nodes when vnodes are only added)
    assert(moved == rows.find(_._1 == 4L).get._3, "moved docs == node 4's new ownership")
    // and that capture is near 32/160 of the corpus (vnode-share theory);
    // allow wide slack for small fixtures
    assert(moved > 0 && moved < n / 2, s"remap $moved of $n implausible")
  }

  test("q273 Neyman: budget lands exactly, weights recompute") {
    val rows = run("q273_neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == 1000L, "largest-remainder rounding hits the budget exactly")
    assert(rows.forall(_._4 >= 0))
    // weight w_h = floor(sqrt(N_h·Σy² − (Σy)²)) recomputes for one stratum
    val (stratum, nh, w, _) = rows.head
    val y = Tables.orders(spark, sf)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === stratum)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
      .agg(count(lit(1)), sum("y"), sum(expr("cast(y as decimal(38,0)) * y"))).collect()(0)
    assert(y.getLong(0) == nh)
    val v = BigDecimal(y.getLong(0)) * y.getDecimal(2).asInstanceOf[java.math.BigDecimal] -
      BigDecimal(y.getLong(1)) * BigDecimal(y.getLong(1))
    assert(w == math.floor(math.sqrt(v.toDouble)).toLong, "Neyman weight recomputes")
  }

  test("q274 dim moments: 64 dims, variance matches a double-precision recompute") {
    val rows = run("q274_dim_moments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 64L))
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.forall(_._2 == nVecs), "every vector contributes to every dimension")
    rows.foreach { case (_, n, s6, mean, varE12) =>
      assert(varE12 >= 0, "population variance non-negative")
      val m = s6.toDouble / n
      assert(math.abs(mean - m) <= 1, "floored mean within 1 of the real mean")
      // e6 coordinates are roughly unit-normalized: variance sane
      assert(varE12 < 4L * 1000000L * 1000000L)
    }
  }

  test("q270 hard negatives: sides verified against a brute-force recompute") {
    val rows = run("q270_hard_negatives").collect()
    assert(rows.length == 20)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val byId = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (anchor, label) = (r.getLong(0), r.getInt(1))
      assert(byId(anchor) == label)
      if (!r.isNullAt(2)) {
        assert(byId(r.getLong(2)) == label, "hard positive shares the anchor's label")
        assert(r.getLong(2) != anchor, "positive is never the anchor itself")
      }
      assert(byId(r.getLong(4)) != label, "hard negative has a different label")
      val (posCos, negCos) = (r.getDouble(3), r.getDouble(5))
      assert(posCos <= 1.000001 && posCos >= -1.000001)
      assert(negCos <= 1.000001 && negCos >= -1.000001)
    }
    // brute-force the first anchor's hard negative
    val a0 = rows.map(_.getLong(0)).min
    val av = e.filter(col("vec_id") === a0).select("v").collect()(0).getSeq[Double](0)
    val best = e.filter(col("vec_id") =!= a0 && col("label") =!= byId(a0))
      .withColumn("c", graft.functions.VectorFunctions.cosineR6(
        lit(av.toArray), col("v")))
      .select("vec_id", "c")
      .orderBy(col("c").desc, col("vec_id")).limit(1)
      .collect()(0)
    val mined = rows.find(_.getLong(0) == a0).get
    assert(mined.getLong(4) == best.getLong(0) && mined.getDouble(5) == best.getDouble(1),
      "mined hard negative matches brute force")
  }
}
