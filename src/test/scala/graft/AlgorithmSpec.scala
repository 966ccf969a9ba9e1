package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the classic-algorithms wave (q445-q448):
  * Morris error accounting, NULL-matrix cross-identities, weighted
  * interval DP replayed in the driver, Huffman replayed in the
  * driver with the Kraft equality.
  */
class AlgorithmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q445 Morris: estimates bounded and bias disclosed") {
    val Array(r) = run("q445_morris_counter").collect()
    assert(r.getLong(5) >= 0L, "estimates nonnegative")
    assert(r.getLong(2) > 0L)
    assert(r.getLong(3) <= 10000L, "mean relative error under 100%")
    assert(math.abs(r.getLong(7)) <= 10000L, "total bias under 100%")
    assert(r.getLong(4) >= r.getLong(3), "worst >= mean")
  }

  test("q446 NULL matrix: cross-identities close the battery") {
    val m = run("q446_null_matrix").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("c01_count_star") == m("c02_count_col") + m("c04_nulls_injected"),
      "count(*) = count(col) + nulls")
    assert(m("c07_null_eq_null_is_null") == m("c04_nulls_injected"),
      "NULL = NULL is NULL, exactly on the injected rows")
    assert(m("c08_nullsafe_eq_true_all") == m("c01_count_star"),
      "null-safe equality is true on every row")
    assert(m("c10_in_null_neither") == m("c05_pri_nulls"),
      "three-valued IN: NULL operand -> NULL, never true/false")
    assert(m("c15_null_group_size") == m("c05_pri_nulls"),
      "NULL keys land in one group of exactly the null count")
    assert(m("c16_collected_nonnull") == m("c02_count_col"),
      "portable filter-first collect matches count(col)")
    assert(m("c06_empty_sum_is_null") == -1L, "sum over empty set is NULL")
    assert(m("c03_count_distinct_skips_null") == 5L)
    assert(m("c14_null_key_is_one_group") == 6L, "5 priorities + null group")
  }

  test("q447 weighted intervals: DP dominates greedy, driver replay agrees") {
    val Array(r) = run("q447_weighted_intervals").collect()
    assert(r.getLong(6) == 0L, "DP never below greedy")
    assert(r.getLong(7) == 0L, "OPT never exceeds the weight total")
    assert(r.getLong(2) >= r.getLong(3))

    // driver replay: exact DP per customer from raw spans
    val iv = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(max(to_date(col("l_shipdate"))).as("e0"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey").as("okey"),
        col("o_custkey").as("c"), to_date(col("o_orderdate")).as("st"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("w")), Seq("okey"))
      .selectExpr("c", "okey",
        "cast(datediff(st, to_date('1990-01-01')) as bigint) as sd",
        "cast(datediff(greatest(e0, st), to_date('1990-01-01')) as bigint) as ed",
        "w")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    var optTotal = 0L
    iv.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(x => (x._4, x._2)) // (ed, okey)
      val dp = new Array[Long](sorted.length + 1)
      sorted.zipWithIndex.foreach { case ((_, _, sd, _, w), i) =>
        val p = sorted.count(_._4 < sd)
        dp(i + 1) = math.max(dp(i), w + dp(p))
      }
      optTotal += dp(sorted.length)
    }
    assert(r.getLong(2) == optTotal, s"replayed OPT: $optTotal vs ${r.getLong(2)}")
  }

  test("q448 Huffman: Kraft equality, beats fixed width, driver replay") {
    val Array(r) = run("q448_huffman").collect()
    val (k, n) = (r.getLong(0), r.getLong(1))
    assert(r.getLong(7) == 1L, "Kraft equality for a complete prefix code")
    assert(r.getLong(3) <= r.getLong(2), "Huffman never worse than fixed")
    assert(r.getLong(3) >= n, "at least one bit per token")
    assert(r.getLong(5) >= 1L && r.getLong(6) <= k - 1)

    // driver replay with the same (freq, min-symbol-index) tie-break
    import graft.functions.TextFunctions.tokens
    val freqs = Tables.documents(spark, sf)
      .select(explode(tokens(lower(col("text")))).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .collect().map(x => x.getString(0) -> x.getLong(1))
      .sortBy(_._1)
    case class Node(f: Long, mi: Int, syms: List[Int])
    var nodes = freqs.zipWithIndex
      .map { case ((_, f), i) => Node(f, i + 1, List(i + 1)) }
      .sortBy(nd => (nd.f, nd.mi)).toList
    val depth = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    while (nodes.length > 1) {
      val (a :: b :: rest) = nodes: @unchecked
      (a.syms ++ b.syms).foreach(s => depth(s) += 1)
      nodes = (Node(a.f + b.f, math.min(a.mi, b.mi), a.syms ++ b.syms) :: rest)
        .sortBy(nd => (nd.f, nd.mi))
    }
    val hbits = freqs.zipWithIndex.map { case ((_, f), i) => f * depth(i + 1) }.sum
    assert(r.getLong(3) == hbits, s"replayed Huffman bits: $hbits vs ${r.getLong(3)}")
  }
}
