package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Election-and-diffusion wave (round 10, ninety-first wave):
  * Chang–Roberts message complexity, md5 avalanche.
  *
  * q499 measures Chang–Roberts (1979) unidirectional ring election on
  * 32 rings of 32 hash-placed nodes each: every node launches its id
  * clockwise and a node forwards only ids larger than its own, so the
  * message count is Σ (distance each id travels before meeting a
  * larger one) plus the winner's full lap — computable exactly from
  * the next-greater-element distance on the circle, no simulation
  * loop needed (the fold IS the closed form). Both extremes are
  * certified per ring: ≥ 2n−1 (ascending ring) and ≤ n(n+1)/2
  * (descending ring), with the measured mean sitting near the n·Hₙ
  * average-case the paper promises. q500 — the five-hundredth
  * oracle-gated query — audits the avalanche property the whole
  * engine's hash discipline rests on: flip ONE input bit (the 0x20
  * ASCII bit: 's:' vs 'S:' prefix) and the two md5_60 digests should
  * differ in ~half their 60 bits. Per-key Hamming distances via
  * bit_count(XOR), the full distribution's mean/min/max beside the
  * exact Binomial(60, ½) moments (mean 30, variance 15), and the
  * χ²-flavored variance ratio at e4 — the diffusion that makes every
  * q*-family hash split, shard, sample, and sketch in this repo
  * statistically honest, measured on its own keys.
  */
object ElectionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G444: Chang–Roberts election message census ────────────────────
    "q499_ring_election" -> ((s, dir) => {
      // spread: the hash filter + 3 md5s per row otherwise run inside
      // the single-row-group scan's one task (guide §2.5)
      val nodes = graft.ops.Relational.spread(Tables.orders(s, dir))
        .filter(expr("pmod(md5_60(concat('rn:', cast(o_orderkey as string))), 14) = 0"))
        .select(col("o_orderkey").as("k"),
          expr("pmod(md5_60(concat('ring:', cast(o_orderkey as string))), 32)")
            .as("ring"),
          expr("md5_60(concat('pos:', cast(o_orderkey as string)))").as("pos"),
          expr("md5_60(concat('id:', cast(o_orderkey as string)))").as("nid"))
      // distance each id travels = next-greater distance clockwise; the
      // winner (ring max) travels the full lap n
      // spreadCompute: the O(n²)-per-ring message fold below sits on a
      // byte-tiny 32-row frame AQE coalesces to one task; pin CPU-sized
      // partitioning so rings fold in parallel
      val perRing = graft.ops.Relational.spreadCompute(
        nodes.groupBy("ring")
          .agg(expr("transform(array_sort(collect_list(struct(pos, k, nid))), " +
            "x -> x.nid)").as("ids"), count(lit(1)).as("n")))
        .withColumn("msgs", expr(
          """aggregate(sequence(1, cast(n as int)), 0L, (acc, i) ->
            |  acc + coalesce(array_min(filter(sequence(1, cast(n as int) - 1),
            |    d -> element_at(ids, cast(pmod(i - 1 + d, n) + 1 as int))
            |      > element_at(ids, i))), n))""".stripMargin))
        .select(col("ring"), col("n"), col("msgs"),
          expr("case when msgs >= 2 * n - 1 then 1L else 0L end").as("lb_ok"),
          expr("case when msgs <= n * (n + 1) div 2 then 1L else 0L end")
            .as("ub_ok"))
      perRing.agg(count(lit(1)).as("n_rings"), sum("n").as("n_nodes"),
          sum("msgs").as("msgs_total"), min("msgs").as("msgs_min"),
          max("msgs").as("msgs_max"),
          sum(expr("1L - lb_ok")).as("n_lb_violations"),
          sum(expr("1L - ub_ok")).as("n_ub_violations"),
          expr("bit_xor(md5_60(concat(cast(ring as string), ':', " +
            "cast(msgs as string))))").as("xor60_elections"))
        .withColumn("mean_msgs_e2", expr("msgs_total * 100 div n_rings"))
        .select("n_rings", "n_nodes", "msgs_total", "mean_msgs_e2",
          "msgs_min", "msgs_max", "n_lb_violations", "n_ub_violations",
          "xor60_elections")
    }),

    // ── G445: md5 avalanche audit (the 500th oracle-gated query) ───────
    "q500_avalanche" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("bit_count(md5_60(concat('s:', cast(o_orderkey as string))) ^ " +
            "md5_60(concat('S:', cast(o_orderkey as string))))").cast("bigint").as("hd"))
      d.agg(count(lit(1)).as("n_keys"),
          sum("hd").as("hd_total"), min("hd").as("hd_min"),
          max("hd").as("hd_max"),
          sum(expr("(2 * hd - 60) * (2 * hd - 60)")).as("dev4"),
          sum(expr("case when hd >= 15 and hd <= 45 then 1L else 0L end"))
            .as("n_in_band"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(hd as string))))").as("xor60_dists"))
        .withColumn("mean_e4", expr("hd_total * 10000 div n_keys"))
        // Var(hd) = Σ(hd−30)² / n = Σ(2hd−60)² / 4n; binomial(60, ½)
        // theory: mean 30, variance 15 → ratio_e4 ≈ 10000
        .withColumn("var_e4", expr("dev4 * 10000 div (4 * n_keys)"))
        .withColumn("var_vs_binomial_e4", expr("var_e4 * 10000 div 150000"))
        .select("n_keys", "mean_e4", "var_e4", "var_vs_binomial_e4",
          "hd_min", "hd_max", "n_in_band", "xor60_dists")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q499_ring_election" ->
      """WITH nodes AS (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5('ring:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 32 AS ring,
        |    CAST('0x' || substr(md5('pos:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS pos,
        |    CAST('0x' || substr(md5('id:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS nid
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('rn:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % 14 = 0),
        |pr AS (SELECT ring,
        |    list_transform(list_sort(list({'pos': pos, 'k': k, 'nid': nid})),
        |      x -> x.nid) AS ids,
        |    COUNT(*) AS n
        |  FROM nodes GROUP BY ring),
        |ms AS (SELECT ring, n,
        |    list_sum(list_transform(range(1, CAST(n AS INT) + 1), i ->
        |      COALESCE(list_min(list_filter(range(1, CAST(n AS INT)),
        |        d -> ids[CAST((i - 1 + d) % n + 1 AS INT)] > ids[CAST(i AS INT)])),
        |        n))) AS msgs
        |  FROM pr)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rings,
        |  CAST(SUM(n) AS BIGINT) AS n_nodes,
        |  CAST(SUM(msgs) AS BIGINT) AS msgs_total,
        |  CAST(SUM(msgs) * 100 // COUNT(*) AS BIGINT) AS mean_msgs_e2,
        |  CAST(MIN(msgs) AS BIGINT) AS msgs_min,
        |  CAST(MAX(msgs) AS BIGINT) AS msgs_max,
        |  CAST(SUM(CASE WHEN msgs >= 2 * n - 1 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_lb_violations,
        |  CAST(SUM(CASE WHEN msgs <= n * (n + 1) // 2 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_ub_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(ring AS VARCHAR) || ':' ||
        |    CAST(msgs AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_elections
        |FROM ms""".stripMargin,

    "q500_avalanche" ->
      """WITH d AS (SELECT o_orderkey AS k,
        |    CAST(bit_count(xor(
        |      CAST('0x' || substr(md5('s:' || CAST(o_orderkey AS VARCHAR)),
        |        1, 15) AS BIGINT),
        |      CAST('0x' || substr(md5('S:' || CAST(o_orderkey AS VARCHAR)),
        |        1, 15) AS BIGINT))) AS BIGINT) AS hd
        |  FROM orders)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(hd) * 10000 // COUNT(*) AS BIGINT) AS mean_e4,
        |  CAST(SUM((2 * hd - 60) * (2 * hd - 60)) * 10000
        |    // (4 * COUNT(*)) AS BIGINT) AS var_e4,
        |  CAST(SUM((2 * hd - 60) * (2 * hd - 60)) * 10000
        |    // (4 * COUNT(*)) * 10000 // 150000 AS BIGINT)
        |    AS var_vs_binomial_e4,
        |  CAST(MIN(hd) AS BIGINT) AS hd_min,
        |  CAST(MAX(hd) AS BIGINT) AS hd_max,
        |  CAST(SUM(CASE WHEN hd >= 15 AND hd <= 45 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_in_band,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(hd AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_dists
        |FROM d""".stripMargin
  )
}
