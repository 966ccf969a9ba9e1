package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the curation-ops wave (q527–q530), plus a
  * bit-exact driver replay of the greedy context packing. */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q527 sweep: survivors monotone non-increasing in tau") {
    val rows = run("q527_dedup_threshold_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty, "at least one threshold has pairs")
    rows.sliding(2).foreach {
      case Array((_, p1, t1, r1), (_, p2, t2, r2)) =>
        assert(p2 <= p1 && t2 <= t1 && r2 <= r1,
          "raising tau can only shrink pairs/touched/removed")
      case _ => ()
    }
    rows.foreach { case (_, _, touched, removed) =>
      assert(removed <= touched, "removed docs are a subset of touched") }
  }

  test("q528 contamination: shares in range, flags bounded") {
    run("q528_split_contamination").collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "hits never exceed grams")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L, "overlap is e4")
      assert(r.getLong(5) <= r.getLong(1), "flagged docs bounded by test docs")
    }
  }

  test("q529 fertility: at least one subword per word") {
    run("q529_tokenizer_fertility").collect().foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "subwords >= words (ceil rule)")
      assert(r.getLong(4) >= 10000L, "fertility e4 >= 1.0")
      assert(r.getLong(5) > 0L, "bytes per token positive")
    }
  }

  test("q530 packing: bit-equal to a driver replay of the greedy fold") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("cast(embedding as array<double>)"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    def cosR6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("size(split(trim(text), '\\\\s+'))").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranked = e.filter(_._1 != 0L).map { case (id, v) => (id, cosR6(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(20)
      .flatMap { case (id, _) => ntok.get(id).map(n => (id, n)) }
    var (used, np, skip, xp) = (0L, 0L, 0L, 0L)
    ranked.foreach { case (id, n) =>
      if (used + n <= 2000L) { used += n; np += 1; xp ^= id } else skip += 1
    }
    val Array(r) = run("q530_context_packing").collect()
    assert(r.getLong(1) == ranked.length, "candidate count")
    assert(r.getLong(2) == np && r.getLong(3) == used, "packed state bit-equal")
    assert(r.getLong(5) == skip && r.getLong(6) == xp, "skip + id xor bit-equal")
  }
}
