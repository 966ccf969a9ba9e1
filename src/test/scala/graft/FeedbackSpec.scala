package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the feedback wave (FeedbackQueries,
  * q295-q298): the expanded ranking dominates or matches the base on
  * query-term mass, BPE pair counts conserve against a direct recount,
  * entry/exit cells partition the session universe, and the snake
  * shards are balanced within one block's spread.
  */
class FeedbackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q295 Rocchio: 10 ranked rows, contiguous ranks, flag marks genuinely-new docs") {
    val rows = run("q295_rocchio_prf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 10)
    assert(rows.map(_._1).sorted.sameElements(1L to 10L))
    // scores non-increasing by rank
    val byRank = rows.sortBy(_._1).map(_._3)
    assert(byRank.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // expansion can only ADD terms, so at least a few base docs persist
    assert(rows.count(!_._4) >= 3, "expanded top-10 lost nearly all base docs — expansion broke scoring")
  }

  test("q296 BPE pairs: counts replay against a direct corpus bigram count") {
    val rows = run("q296_bpe_pair_stats").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, pair, wc, nv) =>
      assert(pair.length == 2)
      assert(wc >= nv, "weighted count ≥ vocab-word count (each word occurs ≥ once)")
    }
    // replay the top pair's weighted count by scanning raw tokens
    val (_, topPair, topCount, _) = rows.minBy(_._1)
    val replay = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .collect().iterator.map(_.getString(0))
      .map(w => (0 until math.max(0, w.length - 1)).count(i => w.substring(i, i + 2) == topPair).toLong)
      .sum
    assert(topCount == replay, s"top pair '$topPair': engine $topCount != replay $replay")
  }

  test("q297 entry/exit: cells partition sessions, bounces have entry == exit") {
    val rows = run("q297_entry_exit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val totalSessions = rows.map(_._3).sum
    // session universe from q50 (same gap rule)
    val q50Sessions = SparkEntry.queries("q50_sessionize")(spark, sf)
      .agg(sum("n_sessions")).collect()(0).getLong(0)
    assert(totalSessions == q50Sessions, "entry×exit cells must partition q50's session universe")
    rows.foreach { case (entry, exit, n, bounces) =>
      assert(n >= 1 && bounces >= 0 && bounces <= n)
      if (entry != exit) assert(bounces == 0, "a 1-event session cannot have entry != exit")
    }
  }

  test("q298 shards: 8 shards, doc counts near-equal, token mass within one block spread") {
    val rows = run("q298_shard_manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 8)
    val nDocs = rows.map(_._2)
    assert(nDocs.max - nDocs.min <= 1, "serpentine assignment balances counts within 1")
    val mass = rows.map(_._3)
    // snake-pairing bound: spread ≤ 2 × the largest document
    val maxDoc = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("nt"))
      .agg(max("nt")).collect()(0).getLong(0)
    assert(mass.max - mass.min <= 2 * maxDoc,
      s"token spread ${mass.max - mass.min} exceeds the snake bound ${2 * maxDoc}")
    // deviations consistent with masses
    val devs = rows.map(_._4)
    assert(devs.forall(d => math.abs(d) <= 10000))
  }
}
