package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the RAG/retrieval-ops wave (q537–q539). */
class RagOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q537 MMR: greedy fold replayed in Scala from the same c6 matrix") {
    import graft.functions.VectorFunctions.{asDouble, cosineR6}
    // rebuild the shortlist + pair matrix exactly as the query's first
    // stages, then replay the greedy in plain Scala integers
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qe"))
    val short = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"), cosineR6(col("v"), col("qe")).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(20)
      .withColumn("rel6", expr("cast(round(cos_r * 1000000) as bigint)"))
    val sl = short.select("vec_id", "rel6").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairC6 = short.select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(short.select(col("vec_id").as("b"), col("v").as("vb")))
      .withColumn("cr", cosineR6(col("va"), col("vb")))
      .select(col("a"), col("b"),
        expr("cast(round(cr * 1000000) as bigint)").as("c6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // greedy replay: idx order = shortlist order (rel desc, vec asc)
    var selected = Vector.empty[(Int, Long)] // (idx, score)
    val n = sl.length
    (1 to 10).foreach { _ =>
      val picked = selected.map(_._1).toSet
      val best = (0 until n).filterNot(picked)
        .map { i =>
          val maxSim = if (selected.isEmpty) 0L
          else selected.map(s => pairC6((sl(i)._1, sl(s._1)._1))).max
          (7 * sl(i)._2 - 3 * maxSim, i)
        }.maxBy { case (sc, i) => (sc, -i) }
      selected :+= ((best._2, best._1))
    }
    val got = run("q537_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.zip(selected.zipWithIndex).foreach {
      case ((rank, vec, rel, sc), ((idx, rsc), pos)) =>
        assert(rank == pos + 1)
        assert(vec == sl(idx)._1, s"rank $rank pick")
        assert(rel == sl(idx)._2 && sc == rsc, s"rank $rank score")
    }
    // structural MMR facts: picks distinct; first pick is pure argmax
    // relevance; the picked score sequence never increases (shrinking
    // candidates, growing penalties)
    assert(got.map(_._2).distinct.length == 10)
    assert(got.head._4 == 7 * got.head._3)
    got.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "greedy max is non-increasing")
      case _ => ()
    }
  }

  test("q538 ERR: bounded, zero iff no relevant, flags consistent") {
    val rows = run("q538_err_cascade").collect()
    assert(rows.length == 8, "one row per query vector 0..7")
    rows.foreach { r =>
      val (qid, err, nRel, first) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(qid >= 0 && qid < 8)
      assert(err >= 0 && err <= 1000000000L, "ERR is a probability-mass sum")
      assert((nRel == 0) == (err == 0L), "ERR > 0 iff a relevant doc ranked")
      assert((nRel == 0) == (first == -1L))
      if (first > 0)
        // the first relevant doc alone contributes >= (1/4)/rank (g>=1,
        // undamped prefix), so ERR is bounded below by it
        assert(err >= 250000000L / first,
          s"qid $qid: err $err < first-click floor at rank $first")
    }
  }

  test("q539 DSIR: ordered manifest, weights inside the ln-kernel range") {
    val rows = run("q539_dsir_weights").collect()
    assert(rows.length == 20)
    val ws = rows.map(_.getLong(3))
    assert(ws.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      "manifest ordered by weight desc")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1, "every doc has tokens")
      // |mean log ratio| <= ln(1e6) since shares are clipped to [1, 1e6]
      assert(math.abs(r.getLong(3)) <= 13815510558L)
    }
    // THE DSIR property: the target domain scores itself higher on
    // average than the rest of the pool — checked corpus-wide (the
    // top-20 manifest alone is too small a sample at sf0.001)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("b", expr(
        "cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % 4096"))
    val tgt = toks.filter(col("lang") === "en").groupBy("b")
      .agg(count(lit(1)).as("tc"))
    val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val tots = raw.agg(sum("rc").as("rtot"))
      .crossJoin(tgt.agg(sum("tc").as("ttot")))
    val shares = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(tots))
      .withColumn("p", expr("greatest(1L, (tc + 1) * 1000000 div (ttot + 4096))"))
      .withColumn("q", expr("greatest(1L, (rc + 1) * 1000000 div (rtot + 4096))"))
      .withColumn("hi", greatest(col("p"), col("q")))
      .withColumn("lo", least(col("p"), col("q")))
    val lw = graft.ops.FixedLn.lnE9(shares, "hi", "lo", "lnhl")
      .withColumn("lr_e9", expr("case when p >= q then lnhl else -lnhl end"))
      .select("b", "lr_e9")
    val byLang = toks.join(broadcast(lw), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(expr("sum(lr_e9) div count(1)").as("w"))
      .groupBy(expr("lang = 'en'").as("isEn")).agg(avg("w").as("mw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"target domain must out-score the pool: $byLang")
  }
}
