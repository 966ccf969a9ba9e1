package graft

/** DuckDB oracle mirrors for the classic-algorithms wave (q445–q448).
  * Split from [[AlgorithmQueries]] only for file size; the SQL here is
  * the contract the engine plans are hash-compared against. DuckDB
  * lambda indices are 1-BASED where Spark's transform indices are
  * 0-based — every (v, i) lambda below accounts for the offset.
  */
object AlgorithmOracles {

  def oracleSql: Map[String, String] = Map(

    "q445_morris_counter" ->
      """WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid FROM events),
        |seq AS (SELECT u, us, eid,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |nu AS (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, i, list_transform([0,0,0,0,0,0,0,0],
        |      (c, r) -> 0::BIGINT + CASE WHEN CAST('0x' ||
        |        substr(md5(CAST(u AS VARCHAR) || ':' || CAST(us AS VARCHAR)
        |          || ':' || CAST(eid AS VARCHAR) || ':'
        |          || CAST(r - 1 AS VARCHAR)), 1, 15) AS BIGINT)
        |        % (1::BIGINT << 0) = 0 THEN 1 ELSE 0 END) AS cs
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s2.u, s2.i, list_transform(r.cs,
        |      (c, rr) -> c + CASE WHEN CAST('0x' ||
        |        substr(md5(CAST(s2.u AS VARCHAR) || ':'
        |          || CAST(s2.us AS VARCHAR) || ':' || CAST(s2.eid AS VARCHAR)
        |          || ':' || CAST(rr - 1 AS VARCHAR)), 1, 15) AS BIGINT)
        |        % (1::BIGINT << CAST(c AS INT)) = 0 THEN 1 ELSE 0 END)
        |  FROM rec r JOIN seq s2 ON s2.u = r.u AND s2.i = r.i + 1),
        |fin AS (SELECT r.u, nu.n_u,
        |    list_sum(list_transform(r.cs,
        |      c -> (1::BIGINT << CAST(c AS INT)) - 1)) // 8 AS est
        |  FROM rec r JOIN nu ON r.u = nu.u WHERE r.i = nu.n_u),
        |ster AS (SELECT u, n_u, est, ABS(est - n_u) AS abs_err FROM fin)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_u) AS BIGINT) AS n_exact,
        |  CAST(SUM(est) AS BIGINT) AS n_est_sum,
        |  CAST(SUM(abs_err * 10000 // n_u) // COUNT(*) AS BIGINT)
        |    AS mean_rel_err_e4,
        |  CAST(MAX(abs_err * 10000 // n_u) AS BIGINT) AS worst_rel_err_e4,
        |  CAST(MIN(est) AS BIGINT) AS est_min,
        |  CAST(MAX(est) AS BIGINT) AS est_max,
        |  CAST((SUM(est) - SUM(n_u)) * 10000 // SUM(n_u) AS BIGINT)
        |    AS total_bias_e4
        |FROM ster""".stripMargin,

    "q446_null_matrix" ->
      """WITH o AS (SELECT o_orderkey AS okey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents0,
        |    o_orderpriority AS pri0,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |        1, 15) AS BIGINT) % 7 = 0 THEN NULL
        |      ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |        1, 15) AS BIGINT) % 11 = 1 THEN NULL
        |      ELSE o_orderpriority END AS pri
        |  FROM orders),
        |checks AS (SELECT
        |    COUNT(*) AS c01_count_star,
        |    COUNT(cents) AS c02_count_col,
        |    COUNT(DISTINCT pri) AS c03_count_distinct_skips_null,
        |    SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END)
        |      AS c04_nulls_injected,
        |    SUM(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS c05_pri_nulls,
        |    COALESCE(SUM(CASE WHEN 1 = 0 THEN cents END), -1)
        |      AS c06_empty_sum_is_null,
        |    SUM(CASE WHEN (cents = cents) IS NULL THEN 1 ELSE 0 END)
        |      AS c07_null_eq_null_is_null,
        |    SUM(CASE WHEN cents IS NOT DISTINCT FROM cents THEN 1 ELSE 0 END)
        |      AS c08_nullsafe_eq_true_all,
        |    SUM(CASE WHEN pri IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |      AS c09_in_true,
        |    SUM(CASE WHEN (pri IN ('1-URGENT', '2-HIGH')) IS NULL
        |      THEN 1 ELSE 0 END) AS c10_in_null_neither,
        |    MIN(cents) AS c11_min_skips_null,
        |    SUM(CASE WHEN COALESCE(cents, 0) = 0 THEN 1 ELSE 0 END)
        |      AS c12_coalesce_zero,
        |    SUM(CASE WHEN NULLIF(pri0, '5-LOW') IS NULL THEN 1 ELSE 0 END)
        |      AS c13_nullif
        |  FROM o),
        |grp AS (SELECT COUNT(*) AS c14_null_key_is_one_group,
        |    SUM(CASE WHEN pri IS NULL THEN cnt ELSE 0 END)
        |      AS c15_null_group_size
        |  FROM (SELECT pri, COUNT(*) AS cnt FROM o GROUP BY pri) g),
        |arr AS (SELECT len(list(cents)) AS c16_collected_nonnull
        |        FROM o WHERE cents IS NOT NULL)
        |SELECT chk AS "check", CAST(v AS BIGINT) AS value FROM (
        |  SELECT 'c01_count_star' AS chk, c01_count_star AS v FROM checks
        |  UNION ALL SELECT 'c02_count_col', c02_count_col FROM checks
        |  UNION ALL SELECT 'c03_count_distinct_skips_null',
        |    c03_count_distinct_skips_null FROM checks
        |  UNION ALL SELECT 'c04_nulls_injected', c04_nulls_injected FROM checks
        |  UNION ALL SELECT 'c05_pri_nulls', c05_pri_nulls FROM checks
        |  UNION ALL SELECT 'c06_empty_sum_is_null', c06_empty_sum_is_null
        |    FROM checks
        |  UNION ALL SELECT 'c07_null_eq_null_is_null',
        |    c07_null_eq_null_is_null FROM checks
        |  UNION ALL SELECT 'c08_nullsafe_eq_true_all',
        |    c08_nullsafe_eq_true_all FROM checks
        |  UNION ALL SELECT 'c09_in_true', c09_in_true FROM checks
        |  UNION ALL SELECT 'c10_in_null_neither', c10_in_null_neither
        |    FROM checks
        |  UNION ALL SELECT 'c11_min_skips_null', c11_min_skips_null FROM checks
        |  UNION ALL SELECT 'c12_coalesce_zero', c12_coalesce_zero FROM checks
        |  UNION ALL SELECT 'c13_nullif', c13_nullif FROM checks
        |  UNION ALL SELECT 'c14_null_key_is_one_group',
        |    c14_null_key_is_one_group FROM grp
        |  UNION ALL SELECT 'c15_null_group_size', c15_null_group_size FROM grp
        |  UNION ALL SELECT 'c16_collected_nonnull', c16_collected_nonnull
        |    FROM arr) z
        |ORDER BY chk""".stripMargin,

    "q447_weighted_intervals" ->
      """WITH RECURSIVE li AS (SELECT l_orderkey AS okey,
        |    MAX(CAST(l_shipdate AS DATE)) AS e0 FROM lineitem GROUP BY 1),
        |iv AS (SELECT o.o_custkey AS c, o.o_orderkey AS okey,
        |    date_diff('day', DATE '1990-01-01', CAST(o.o_orderdate AS DATE))
        |      AS sd,
        |    date_diff('day', DATE '1990-01-01',
        |      GREATEST(li.e0, CAST(o.o_orderdate AS DATE))) AS ed,
        |    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS w
        |  FROM orders o JOIN li ON o.o_orderkey = li.okey),
        |seq AS (SELECT a.c, a.okey, a.sd, a.ed, a.w,
        |    ROW_NUMBER() OVER (PARTITION BY a.c ORDER BY a.ed, a.okey) AS i,
        |    (SELECT COUNT(*) FROM iv b WHERE b.c = a.c AND b.ed < a.sd) AS p
        |  FROM iv a),
        |nc AS (SELECT c, COUNT(*) AS n_iv, SUM(w) AS w_total
        |       FROM iv GROUP BY c),
        |rec AS (
        |  SELECT c, i, [0::BIGINT, GREATEST(0, w + 0)] AS dp,
        |    ed AS last, w AS gv, 1::BIGINT AS gk
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.c, s.i,
        |    list_append(r.dp, GREATEST(r.dp[len(r.dp)],
        |      s.w + r.dp[CAST(s.p AS INT) + 1])),
        |    CASE WHEN s.sd > r.last THEN s.ed ELSE r.last END,
        |    r.gv + CASE WHEN s.sd > r.last THEN s.w ELSE 0 END,
        |    r.gk + CASE WHEN s.sd > r.last THEN 1 ELSE 0 END
        |  FROM rec r JOIN seq s ON s.c = r.c AND s.i = r.i + 1),
        |fin AS (SELECT r.c, nc.n_iv, nc.w_total,
        |    r.dp[len(r.dp)] AS opt, r.gv AS greedy_w
        |  FROM rec r JOIN nc ON r.c = nc.c WHERE r.i = nc.n_iv)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(SUM(opt) AS BIGINT) AS opt_total,
        |  CAST(SUM(greedy_w) AS BIGINT) AS greedy_total,
        |  CAST((SUM(opt) - SUM(greedy_w)) * 10000 // SUM(greedy_w) AS BIGINT)
        |    AS lift_e4,
        |  CAST(SUM(CASE WHEN opt > greedy_w THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dp_strictly_better,
        |  CAST(SUM(CASE WHEN opt < greedy_w THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dp_below_greedy,
        |  CAST(SUM(CASE WHEN opt > w_total THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_over_total,
        |  bit_xor(CAST('0x' || substr(md5(CAST(c AS VARCHAR) || ':' ||
        |    CAST(opt AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_opt
        |FROM fin""".stripMargin,

    "q448_huffman" ->
      """WITH RECURSIVE vocab AS (SELECT tok, COUNT(*) AS f FROM (
        |    SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS tok FROM documents) z
        |  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok),
        |idx AS (SELECT tok, f,
        |    ROW_NUMBER() OVER (ORDER BY tok) AS si FROM vocab),
        |kk AS (SELECT COUNT(*) AS k, SUM(f) AS n_tokens FROM vocab),
        |init AS (SELECT list(struct_pack(f := f, mi := si, idxs := [si])
        |    ORDER BY f, si) AS ns,
        |    list_transform(list(si), x -> 0::BIGINT) AS d
        |  FROM idx),
        |fl AS (SELECT list(f ORDER BY si) AS flist FROM idx),
        |rec AS (
        |  SELECT 1::BIGINT AS step, ns, d FROM init
        |  UNION ALL
        |  SELECT r.step + 1,
        |    list_sort(list_append(r.ns[3:],
        |      struct_pack(f := r.ns[1].f + r.ns[2].f,
        |        mi := LEAST(r.ns[1].mi, r.ns[2].mi),
        |        idxs := r.ns[1].idxs || r.ns[2].idxs))),
        |    list_transform(r.d, (dv, i) -> dv +
        |      CASE WHEN list_contains(r.ns[1].idxs, CAST(i AS BIGINT))
        |        OR list_contains(r.ns[2].idxs, CAST(i AS BIGINT))
        |      THEN 1 ELSE 0 END)
        |  FROM rec r, kk WHERE r.step < kk.k),
        |fin AS (SELECT r.d FROM rec r, kk WHERE r.step = kk.k),
        |stats AS (SELECT
        |    list_sum(list_transform(fin.d, (dv, i) -> fl.flist[i] * dv))
        |      AS hbits,
        |    list_aggregate(fin.d, 'max') AS maxd,
        |    list_aggregate(fin.d, 'min') AS mind,
        |    list_sum(list_transform(fin.d,
        |      dv -> 1::BIGINT << CAST(list_aggregate(fin.d, 'max') - dv
        |        AS INT))) AS kraft
        |  FROM fin, fl),
        |rc AS (SELECT bit_xor(CAST('0x' || substr(md5(i.tok || ':' ||
        |      CAST(dd.dv AS VARCHAR)), 1, 15) AS BIGINT)) AS xr
        |  FROM (SELECT UNNEST(d) AS dv, generate_subscripts(d, 1) AS si
        |        FROM fin) dd
        |  JOIN idx i ON i.si = dd.si)
        |SELECT CAST(kk.k AS BIGINT) AS k,
        |  CAST(kk.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(kk.n_tokens * length(bin(kk.k - 1)) AS BIGINT) AS fixed_bits,
        |  CAST(stats.hbits AS BIGINT) AS huffman_bits,
        |  CAST((kk.n_tokens * length(bin(kk.k - 1)) - stats.hbits) * 10000
        |    // (kk.n_tokens * length(bin(kk.k - 1))) AS BIGINT) AS savings_e4,
        |  CAST(stats.mind AS BIGINT) AS depth_min,
        |  CAST(stats.maxd AS BIGINT) AS depth_max,
        |  CAST(CASE WHEN stats.kraft = (1::BIGINT << CAST(stats.maxd AS INT))
        |    THEN 1 ELSE 0 END AS BIGINT) AS kraft_ok,
        |  rc.xr AS xor60_code
        |FROM kk, stats, rc""".stripMargin
  )
}
