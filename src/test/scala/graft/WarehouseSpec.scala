package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the warehouse surface (WarehouseQueries,
  * q173-q178): streak histogram tiles the user base, the weighted
  * median satisfies its defining inequalities, phrase hits recount from
  * raw text, the MV navigator audit is all-consistent, TWAP is bounded
  * by the per-type value range, and the Gram matrix diagonal/symmetry
  * properties hold against a driver-side recomputation.
  */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q173 longest streak: histogram tiles the distinct-user base; recount one user") {
    val rows = run("q173_longest_streak").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = Tables.events(spark, sf)
    val nUsers = e.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers, "every user has exactly one longest streak")
    assert(rows.forall(_._1 >= 1))
    // recompute the busiest user's longest streak directly
    val uid = e.groupBy("user_id").count().orderBy(desc("count"), col("user_id"))
      .first().getLong(0)
    val days = e.filter(col("user_id") === uid)
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate).sorted
    val longest = days.foldLeft((0L, 0L, Option.empty[java.time.LocalDate])) {
      case ((best, cur, prev), d) =>
        val run = if (prev.exists(p => p.plusDays(1) == d)) cur + 1 else 1L
        (math.max(best, run), run, Some(d))
    }._1
    val hist = rows.toMap
    // the user's longest streak bucket must exist and the recount must be
    // consistent with SOME user in that bucket; strongest cheap check:
    // recompute the full per-user longest map for the fixture SF
    val perUser = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (u, ds) =>
        val sd = ds.map(_._2).distinct.sorted
        val l = sd.foldLeft((0L, 0L, Option.empty[java.time.LocalDate])) {
          case ((best, cur, prev), d) =>
            val run = if (prev.exists(p => p.plusDays(1) == d)) cur + 1 else 1L
            (math.max(best, run), run, Some(d))
        }._1
        (u, l)
      }
    assert(perUser(uid) == longest)
    val expectHist = perUser.values.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(hist == expectHist, "histogram equals the driver-side recomputation")
  }

  test("q174 weighted median: defining inequalities hold per flag") {
    val rows = run("q174_weighted_median").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val cells = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("p2"),
        expr("cast(round(l_quantity * 100) as bigint)").as("q2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (flag, med, tot) =>
      val g = cells.filter(_._1 == flag)
      assert(g.map(_._3).sum == tot, s"$flag total weight")
      val below = g.filter(_._2 < med).map(_._3).sum
      val upto = g.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < tot, s"$flag strictly-below mass must miss half")
      assert(upto * 2 >= tot, s"$flag mass up to the median must reach half")
      assert(g.exists(_._2 == med), s"$flag median is an observed price")
    }
  }

  test("q175 phrase retrieval: per-doc counts recount from raw text") {
    val rows = run("q175_phrase_retrieval").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      val t = text.trim.split("\\s+")
      (id, t.sliding(2).count(p => p.length == 2 && p(0) == "table" && p(1) == "hash").toLong)
    }.filter(_._2 > 0).toMap
    assert(rows == expect, "phrase occurrence counts match a direct scan")
  }

  test("q176 aggregate navigator: every rollup cell is consistent with the direct answer") {
    val rows = run("q176_agg_navigator").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("consistent")),
      "MV-answered rollup must equal the direct aggregate on every cell")
    // n months x types cells both sides join-complete: no cell lost
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM").as("m"))
      .count().count()
    assert(rows.length.toLong == direct, "one output row per (type, month) cell")
  }

  test("q177 TWAP: bounded by the per-type value range; spans positive") {
    val rows = run("q177_twap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val bounds = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(min(expr("cast(round(value * 1000000) as bigint)")).as("lo"),
        max(expr("cast(round(value * 1000000) as bigint)")).as("hi"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (t, n, span, twap) =>
      assert(n > 0 && span > 0, s"$t span")
      val (lo, hi) = bounds(t)
      assert(twap >= lo - 1 && twap <= hi + 1, s"$t TWAP inside value range")
    }
  }

  test("q178 Gram matrix: upper triangle complete, diagonal PSD, one entry recomputed") {
    val rows = run("q178_gram_matrix").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDecimal(3))))
      .toMap
    val d = 64
    assert(rows.size == d * (d + 1) / 2, "full upper triangle")
    assert(rows.forall { case ((i, j), _) => j >= i })
    rows.filter { case ((i, j), _) => i == j }.foreach { case (_, (_, g)) =>
      assert(g.signum() >= 0, "diagonal entries are sums of squares")
    }
    // recompute entry (1, 2) exactly
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0))
    val e12 = vecs.map { v =>
      BigInt(math.round(v(0) * 1e6)) * BigInt(math.round(v(1) * 1e6))
    }.sum
    assert(BigInt(rows((1L, 2L))._2.toBigInteger) == e12, "entry (1,2) exact")
    assert(rows((1L, 2L))._1 == vecs.length.toLong)
  }
}
