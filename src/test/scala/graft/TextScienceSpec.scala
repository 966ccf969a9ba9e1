package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the text-science wave (TextScienceQueries,
  * q333-q336): the BPE argmax replays driver-side and merges shrink the
  * symbol stream by at most the pair count (overlaps merge
  * leftmost-first), the rebuild conserves chunk accounting, the Zipf
  * slope is negative with a complete bucket spine, and burstiness is
  * non-negative with bounded document share.
  */
class TextScienceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q333 BPE: round-1 argmax replays driver-side, merges shrink the stream") {
    val rows = run("q333_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Seq(1L, 2L, 3L)))
    // replay round 1 from the raw corpus
    val freqs = Tables.documents(spark, sf)
      .selectExpr("explode(split(trim(text), '\\\\s+')) as w")
      .groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    freqs.foreach { case (w, f) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + f
      }
    }
    val best = pairCounts.toSeq.sortBy { case ((a, b), f) => (-f, a, b) }.head
    assert((rows(0)._2, rows(0)._3) == best._1, "round-1 merge must be the true argmax")
    assert(rows(0)._4 == best._2, "round-1 pair frequency must match the replay")
    // each merge round shrinks the weighted symbol stream, by at most pf
    // (leftmost-first non-overlap can merge fewer than the pair count)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._6 < a._6, "total symbols must strictly decrease")
      assert(a._6 - b._6 <= b._4, "decrease is bounded by the merged pair's count")
      assert(b._4 <= a._4, "best-pair frequency is non-increasing across rounds")
    }
  }

  test("q334 rebuild: chunk accounting conserved, kept = distinct fingerprints") {
    val rows = run("q334_chunk_dedup_rebuild").collect()
    var kept = 0L; var total = 0L; var nDocs = 0L
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "kept <= total chunks per source")
      assert(r.getLong(6) <= r.getLong(5), "tokens after <= before per source")
      assert(r.getLong(2) <= r.getLong(1), "docs changed <= docs")
      kept += r.getLong(4); total += r.getLong(3); nDocs += r.getLong(1)
    }
    val docs = Tables.documents(spark, sf)
    assert(nDocs <= docs.count(), "a fully-duplicated doc may vanish, never appear")
    val distinctFp = docs
      .selectExpr("doc_id", "posexplode(split(trim(text), '\\\\s+')) as (pos, tok)")
      .selectExpr("doc_id", "pos div 25 as chunk", "pos", "tok")
      .groupBy("doc_id", "chunk")
      .agg(org.apache.spark.sql.functions.expr(
        "md5(array_join(transform(array_sort(collect_list(struct(pos, tok))), e -> e.tok), ' '))").as("fp"))
      .select("fp").distinct().count()
    assert(kept == distinctFp, "exactly one survivor per distinct chunk text")
  }

  test("q335 Zipf: complete bucket spine, vocabulary conserved, slope replays") {
    val rows = run("q335_zipf_fit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val buckets = rows.map(_._1)
    assert(buckets.min == 1 && buckets.sameElements(buckets.min to buckets.max),
      "bit_length buckets are contiguous from 1")
    val vocab = Tables.documents(spark, sf)
      .selectExpr("explode(split(trim(text), '\\\\s+')) as t").distinct().count()
    assert(rows.map(_._2).sum == vocab, "every vocabulary term lands in one bucket")
    // ranks sorted by frequency desc => bucket mean freq (hence its floor-log)
    // is non-increasing in the bucket index, so the OLS slope is <= 0. The
    // synthetic corpus draws its 31 words near-uniformly, so the HONEST
    // answer here is ~0 ("not power-law") — which is the degeneracy the
    // health check exists to flag; a natural corpus lands near -1.
    val m = rows.length.toLong
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._4).sum)
    val (sxy, sxx) = (rows.map(r => r._1 * r._4).sum, rows.map(r => r._1 * r._1).sum)
    val num = (m * sxy - sx * sy) * 10000
    val den = m * sxx - sx * sx
    val expected = if (num >= 0) num / den else -((-num) / den)
    assert(rows.head._5 == expected, "slope must replay from the emitted buckets")
    assert(rows.head._5 <= 0, "slope cannot be positive for a freq-desc ranking")
  }

  test("q336 burstiness: VMR >= 0, shares bounded, top-df terms only") {
    val rows = run("q336_term_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { case (tok, df, share, vmr) =>
      assert(df > 0 && share > 0 && share <= 10000)
      assert(vmr >= 0, s"$tok: variance-to-mean cannot be negative")
    }
  }
}
