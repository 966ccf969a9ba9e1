package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lattice-and-histogram wave (round 10, seventy-sixth wave): HRU
  * cube view selection with its approximation certificate, and the
  * V-optimal histogram DP.
  *
  * q463 is Harinarayan–Rajaraman–Ullman (SIGMOD 1996): which 3 cube
  * views to materialize under the linear cost model, where answering
  * a query at view v costs the size of its smallest materialized
  * ancestor. The 8-view (nation × month × priority) lattice sizes
  * come from ONE cube() pass; every one of the 2⁷ candidate sets is
  * then COSTED on the 128-row mask grain (corpus-free), the greedy
  * is derived by three min-steps over that same table, and the
  * textbook (1−1/e) guarantee is certified against the true optimum
  * by exhaustive comparison — benefit_greedy·1000 ≥ 632·benefit_opt,
  * checked, not cited. q466 is the V-optimal histogram (Jagadish et
  * al., VLDB 1998): exact DP over the monthly order-count series —
  * dp[b][i] = min_j dp[b−1][j] + SSE(j..i] with SSE from prefix
  * arrays at e2 — emitted as the whole B = 1..8 curve (diminishing
  * returns made visible), certified monotone in B and never worse
  * than the equi-width histogram at the same budget.
  */
object LatticeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G407: HRU greedy view selection, (1−1/e) certified ─────────────
    // View mask: bit0 = nation, bit1 = month, bit2 = priority; the
    // apex gmp (mask 7) is always materialized. Candidate sets range
    // over the other 7 views; T(S) = Σ_{v=0..7} min size of an
    // ancestor of v in S ∪ {7} (w ancestor of v ⟺ (v & w) = v).
    "q463_view_selection" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("month(to_date(o_orderdate))").as("m"),
          col("o_orderpriority").as("p"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      // the 8 view sizes as parallel count-distincts in one aggregate
      // (CUBE over a join's columns trips Spark's spurious self-join
      // ambiguity check — and the apex-less view {} has size 1, the
      // single grand-total row, not count(*))
      val szArr = o.join(c, "o_custkey")
        .agg(countDistinct(col("g")).as("n1"),
          countDistinct(col("m")).as("n2"),
          countDistinct(col("g"), col("m")).as("n3"),
          countDistinct(col("p")).as("n4"),
          countDistinct(col("g"), col("p")).as("n5"),
          countDistinct(col("m"), col("p")).as("n6"),
          countDistinct(col("g"), col("m"), col("p")).as("n7"))
        .select(expr("array(1L, n1, n2, n3, n4, n5, n6, n7)").as("sz"))
      // T(mask) for every candidate subset of the 7 non-apex views
      // T(mask) for all 128 candidate sets, then base/opt/greedy all as
      // HOF expressions over ONE array row — self-join-free by design
      val tCost =
        """aggregate(sequence(0, 7), 0L, (a, v) ->
          |  a + aggregate(sequence(0, 7), element_at(sz, 8), (best, w) ->
          |    case when ((v & w) = v)
          |          and (w = 7 or ((mk div cast(shiftleft(1, w) as int)) % 2) = 1)
          |          and element_at(sz, w + 1) < best
          |      then element_at(sz, w + 1) else best end))""".stripMargin
      val stepG =
        """aggregate(sequence(0, 6),
          |  named_struct('bm', -1, 'bt', 9223372036854775807L),
          |  (bst, cc) -> case
          |    when (acc div cast(shiftleft(1, cc) as int)) % 2 = 1 then bst
          |    when element_at(tc, (acc + cast(shiftleft(1, cc) as int)) + 1)
          |         < bst.bt
          |      then named_struct('bm', acc + cast(shiftleft(1, cc) as int),
          |        'bt', element_at(tc, (acc + cast(shiftleft(1, cc) as int)) + 1))
          |    else bst end).bm""".stripMargin
      val one = szArr
        .withColumn("tc", expr(
          s"transform(sequence(0, 127), mk -> $tCost)"))
        .withColumn("t_base", expr("element_at(tc, 1)"))
        .withColumn("t_opt", expr(
          """aggregate(sequence(0, 127), element_at(tc, 1), (m, mk) ->
            |  case when bit_count(mk) = 3 and element_at(tc, mk + 1) < m
            |    then element_at(tc, mk + 1) else m end)""".stripMargin))
        .withColumn("opt_mask", expr(
          """aggregate(sequence(0, 127), 128L, (m, mk) ->
            |  case when bit_count(mk) = 3
            |    and element_at(tc, mk + 1) = t_opt
            |    and cast(mk as bigint) < m then cast(mk as bigint)
            |  else m end)""".stripMargin))
        .withColumn("greedy_mask", expr(
          s"""cast(aggregate(sequence(1, 3), 0, (acc, stp) -> $stepG)
             |  as bigint)""".stripMargin))
        .withColumn("t_greedy", expr(
          "element_at(tc, cast(greedy_mask as int) + 1)"))
      one.select(col("t_base"), col("t_greedy"), col("t_opt"),
          expr("t_base - t_greedy").as("benefit_greedy"),
          expr("t_base - t_opt").as("benefit_opt"),
          expr("case when (t_base - t_greedy) * 1000 >= 632 * (t_base - t_opt) " +
            "then 1L else 0L end").as("hru_bound_ok"),
          col("greedy_mask").cast("long").as("greedy_mask"),
          col("opt_mask").cast("long").as("opt_mask"),
          expr("case when t_greedy = t_opt then 1L else 0L end")
            .as("greedy_is_optimal"))
    }),

    // ── G408: V-optimal histogram DP (B = 1..8 curve) ──────────────────
    "q466_voptimal_histogram" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .groupBy(expr("date_trunc('month', to_date(o_orderdate))").as("mo"))
        .agg(count(lit(1)).as("x"))
      val packed = monthly
        .agg(expr("transform(array_sort(collect_list(struct(mo, x))), z -> z.x)")
          .as("xs"), count(lit(1)).as("n_points"))
        // prefix arrays: ps[i] = Σ_{j≤i} x_j, pss[i] = Σ x_j² (1-based,
        // position i+1 holds prefix i; position 1 = 0)
        .withColumn("ps", expr(
          """transform(sequence(0, cast(n_points as int)), i ->
            |  aggregate(slice(xs, 1, i), 0L, (a, v) -> a + v))""".stripMargin))
        .withColumn("pss", expr(
          """transform(sequence(0, cast(n_points as int)), i ->
            |  aggregate(slice(xs, 1, i), 0L, (a, v) -> a + v * v))""".stripMargin))
        // 1 row — but every sse mention in the DP below would otherwise
        // INLINE the whole prefix-transform expression (withColumn
        // collapse), exploding the tree; checkpoint so ps/pss are plain
        // column reads (32 s → ~1 s at sf0.001)
        .localCheckpoint()
      // sse(j, i) at e2 over (j, i] (0-based prefix indices, j < i)
      val sse = "(((ii - jj) * (element_at(pss, cast(ii as int) + 1) " +
        "- element_at(pss, cast(jj as int) + 1)) " +
        "- (element_at(ps, cast(ii as int) + 1) " +
        "- element_at(ps, cast(jj as int) + 1)) " +
        "* (element_at(ps, cast(ii as int) + 1) " +
        "- element_at(ps, cast(jj as int) + 1))) * 100 div (ii - jj))"
      val dp = packed.withColumn("curve", expr(
        s"""aggregate(sequence(2, 8),
           |  array(transform(sequence(1L, n_points), ii ->
           |    ${sse.replace("jj", "0L")})),
           |  (acc, b) -> concat(acc, array(
           |    transform(sequence(1L, n_points), ii ->
           |      aggregate(sequence(1L, greatest(ii - 1, 1L)),
           |        element_at(element_at(acc, b - 1), cast(ii as int)),
           |        (m, jj) -> least(m,
           |          element_at(element_at(acc, b - 1), cast(jj as int))
           |            + (case when jj < ii then $sse else 0L end)))))))"""
          .stripMargin))
        .withColumn("vopt", expr(
          "transform(curve, row -> element_at(row, cast(n_points as int)))"))
        // equi-width at B buckets: boundaries at round(k·n/B)
        .withColumn("ew", expr(
          s"""transform(sequence(1, 8), b ->
             |  aggregate(sequence(1, b), 0L, (a, k) ->
             |    a + (case when (k - 1) * n_points div b
             |              < k * n_points div b
             |      then ${sse.replace("jj", "((cast(k as bigint) - 1) * n_points div b)")
                         .replace("ii", "(cast(k as bigint) * n_points div b)")}
             |      else 0L end)))""".stripMargin))
      dp.select(posexplode(col("vopt")).as(Seq("b0", "vopt_sse_e2")),
          col("ew"), col("n_points"))
        .select(expr("cast(b0 + 1 as bigint)").as("b"), col("n_points"),
          col("vopt_sse_e2"),
          expr("element_at(ew, b0 + 1)").as("ew_sse_e2"),
          expr("case when vopt_sse_e2 <= element_at(ew, b0 + 1) " +
            "then 1L else 0L end").as("vopt_not_worse"),
          expr("case when element_at(ew, b0 + 1) > 0 then " +
            "(element_at(ew, b0 + 1) - vopt_sse_e2) * 10000 " +
            "div element_at(ew, b0 + 1) else 0L end").as("improvement_e4"))
        .orderBy("b")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q463_view_selection" ->
      """WITH j AS (SELECT c.c_nationkey AS g,
        |    month(CAST(o.o_orderdate AS DATE)) AS m, o.o_orderpriority AS p
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |sz AS (
        |  SELECT 0 AS vmask, 1::BIGINT AS vsize
        |  UNION ALL SELECT 1, COUNT(*) FROM (SELECT DISTINCT g FROM j) z1
        |  UNION ALL SELECT 2, COUNT(*) FROM (SELECT DISTINCT m FROM j) z2
        |  UNION ALL SELECT 3, COUNT(*) FROM (SELECT DISTINCT g, m FROM j) z3
        |  UNION ALL SELECT 4, COUNT(*) FROM (SELECT DISTINCT p FROM j) z4
        |  UNION ALL SELECT 5, COUNT(*) FROM (SELECT DISTINCT g, p FROM j) z5
        |  UNION ALL SELECT 6, COUNT(*) FROM (SELECT DISTINCT m, p FROM j) z6
        |  UNION ALL SELECT 7, COUNT(*)
        |    FROM (SELECT DISTINCT g, m, p FROM j) z7),
        |sza AS (SELECT list_transform(list_sort(list(struct_pack(
        |    vmask := vmask, vsize := vsize))), z -> z.vsize) AS sz FROM sz),
        |ct AS (SELECT mask, bit_count(mask) AS k,
        |    list_sum(list_transform(range(0, 8), v ->
        |      list_aggregate(list_transform(range(0, 8), w ->
        |        CASE WHEN ((v & w) = v) AND (w = 7
        |            OR ((mask // (1 << CAST(w AS INT))) % 2) = 1)
        |          THEN sza.sz[CAST(w AS INT) + 1]
        |          ELSE sza.sz[8] END), 'min'))) AS t_cost
        |  FROM (SELECT UNNEST(range(0, 128)) AS mask) ms, sza),
        |base AS (SELECT t_cost AS t_base FROM ct WHERE mask = 0),
        |opt AS (SELECT MIN(t_cost) AS t_opt FROM ct WHERE k = 3),
        |om AS (SELECT MIN(mask) AS opt_mask FROM ct, opt
        |       WHERE k = 3 AND t_cost = opt.t_opt),
        |g1 AS (SELECT MIN(mask) AS m1 FROM ct
        |  WHERE k = 1 AND t_cost = (SELECT MIN(t_cost) FROM ct WHERE k = 1)),
        |g2 AS (SELECT MIN(ct.mask) AS m2 FROM ct, g1
        |  WHERE (ct.mask & g1.m1) = g1.m1 AND ct.k = 2
        |    AND ct.t_cost = (SELECT MIN(c2.t_cost) FROM ct c2, g1
        |      WHERE (c2.mask & g1.m1) = g1.m1 AND c2.k = 2)),
        |g3 AS (SELECT MIN(ct.mask) AS m3 FROM ct, g2
        |  WHERE (ct.mask & g2.m2) = g2.m2 AND ct.k = 3
        |    AND ct.t_cost = (SELECT MIN(c3.t_cost) FROM ct c3, g2
        |      WHERE (c3.mask & g2.m2) = g2.m2 AND c3.k = 3)),
        |tg AS (SELECT ct.t_cost AS t_greedy, g3.m3 AS greedy_mask
        |       FROM ct, g3 WHERE ct.mask = g3.m3)
        |SELECT CAST(base.t_base AS BIGINT) AS t_base,
        |  CAST(tg.t_greedy AS BIGINT) AS t_greedy,
        |  CAST(opt.t_opt AS BIGINT) AS t_opt,
        |  CAST(base.t_base - tg.t_greedy AS BIGINT) AS benefit_greedy,
        |  CAST(base.t_base - opt.t_opt AS BIGINT) AS benefit_opt,
        |  CAST(CASE WHEN (base.t_base - tg.t_greedy) * 1000
        |    >= 632 * (base.t_base - opt.t_opt) THEN 1 ELSE 0 END AS BIGINT)
        |    AS hru_bound_ok,
        |  CAST(tg.greedy_mask AS BIGINT) AS greedy_mask,
        |  CAST(om.opt_mask AS BIGINT) AS opt_mask,
        |  CAST(CASE WHEN tg.t_greedy = opt.t_opt THEN 1 ELSE 0 END AS BIGINT)
        |    AS greedy_is_optimal
        |FROM base, opt, om, tg""".stripMargin,

    "q466_voptimal_histogram" -> {
      val sseD = "(((ii - jj) * (pss[CAST(ii AS INT) + 1] " +
        "- pss[CAST(jj AS INT) + 1]) " +
        "- (ps[CAST(ii AS INT) + 1] - ps[CAST(jj AS INT) + 1]) " +
        "* (ps[CAST(ii AS INT) + 1] - ps[CAST(jj AS INT) + 1])) " +
        "* 100 // (ii - jj))"
      s"""WITH RECURSIVE monthly AS (
        |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
        |    COUNT(*) AS x FROM orders GROUP BY 1),
        |pk AS (SELECT list_transform(list_sort(list(struct_pack(
        |    mo := mo, x := x))), z -> z.x) AS xs,
        |    COUNT(*) AS n_points FROM monthly),
        |pre AS (SELECT xs, n_points,
        |    list_transform(range(0, CAST(n_points AS INT) + 1), i ->
        |      list_sum(list_append(xs[1:CAST(i AS INT)], 0))) AS ps,
        |    list_transform(range(0, CAST(n_points AS INT) + 1), i ->
        |      list_sum(list_append(list_transform(xs[1:CAST(i AS INT)],
        |        v -> v * v), 0))) AS pss
        |  FROM pk),
        |dp AS (
        |  SELECT 1::BIGINT AS b, n_points, ps, pss,
        |    list_transform(range(1, CAST(n_points AS INT) + 1), ii ->
        |      ${sseD.replace("jj", "0")}) AS row,
        |    list_transform(range(1, CAST(n_points AS INT) + 1), ii ->
        |      ${sseD.replace("jj", "0")}) AS prev
        |  FROM pre
        |  UNION ALL
        |  SELECT b + 1, n_points, ps, pss,
        |    list_transform(range(1, CAST(n_points AS INT) + 1), ii ->
        |      list_aggregate(list_append(
        |        list_transform(range(1, CAST(ii AS INT)), jj ->
        |          row[CAST(jj AS INT)] + $sseD),
        |        row[CAST(ii AS INT)]), 'min')),
        |    row
        |  FROM dp WHERE b < 8),
        |curve AS (SELECT b, row[CAST(n_points AS INT)] AS vopt_sse_e2,
        |    n_points, ps, pss FROM dp),
        |ew AS (SELECT b, n_points,
        |    list_sum(list_transform(range(1, CAST(b AS INT) + 1), k ->
        |      CASE WHEN (k - 1) * n_points // b < k * n_points // b
        |        THEN ${sseD
               .replace("jj", "((k - 1) * n_points // b)")
               .replace("ii", "(k * n_points // b)")}
        |        ELSE 0 END)) AS ew_sse_e2
        |  FROM curve)
        |SELECT c.b, CAST(c.n_points AS BIGINT) AS n_points,
        |  CAST(c.vopt_sse_e2 AS BIGINT) AS vopt_sse_e2,
        |  CAST(e.ew_sse_e2 AS BIGINT) AS ew_sse_e2,
        |  CAST(CASE WHEN c.vopt_sse_e2 <= e.ew_sse_e2 THEN 1 ELSE 0 END
        |    AS BIGINT) AS vopt_not_worse,
        |  CAST(CASE WHEN e.ew_sse_e2 > 0 THEN
        |    (e.ew_sse_e2 - c.vopt_sse_e2) * 10000 // e.ew_sse_e2
        |    ELSE 0 END AS BIGINT) AS improvement_e4
        |FROM curve c JOIN ew e ON c.b = e.b
        |ORDER BY c.b""".stripMargin
    }
  )
}
