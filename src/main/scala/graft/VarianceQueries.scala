package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calibration-and-variance wave (round 10, sixty-first wave): the
  * Murphy decomposition of the Brier score certified bin-by-bin,
  * CUPED variance reduction with its ρ² identity, delete-one
  * jackknife influence on a ratio estimator, and the Hampel filter
  * as a series repair.
  *
  * Reference intent: the reference reports forecast quality as a
  * single aggregate (services/training-service logs one RMSE per
  * store) — no calibration split, no variance accounting, no
  * influence audit, no robust repair. q417 splits a probability
  * forecast's Brier score into calibration and refinement via the
  * EXACT within-bin identity n_k·SSE_k = (n_k·F_k − 100·s_k)² +
  * 10⁴·s_k·(n_k − s_k), violations counted at zero. q418 is CUPED
  * (Deng et al., WSDM 2013): the pre-period covariate soaks up ρ² of
  * the metric variance, with every moment n²-scaled so θ = Cxy/Vx
  * never materializes as a float. q419 jackknifes the average-order-
  * value ratio by deleting one customer at a time — O(m) via totals,
  * never m re-aggregations — surfacing the most influential customer.
  * q420 repairs event-count series with the Hampel filter (rolling
  * 7-day median ± 3·1.4826·MAD), the robust cousin of q232's 3σ rule.
  */
object VarianceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G362: Brier score, Murphy-decomposed and certified ─────────────
    // Forecast: each order scored with its customer's urgent share
    // (priorities 1-2) at e2 — a calibration AUDIT grain, one bin per
    // distinct share value. Label: the order itself is urgent. Per
    // bin the decomposition identity holds in INTEGERS:
    //   n_k·SSE_k = (n_k·F_k − 100·s_k)² + 10⁴·s_k·(n_k − s_k)
    // (calibration² term + within-bin refinement), emitted with
    // violations counted — the identity is data, not prose. Global
    // Brier at e6 = Σ SSE_k · 100 div n.
    "q417_brier_murphy" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("y"))
      val cust = o.groupBy("c").agg(
        expr("sum(y) * 100 div count(*)").as("f_e2"))
      val scored = o.join(cust, "c")
      val bins = scored.groupBy("f_e2").agg(
          count(lit(1)).as("n_k"), sum("y").as("s_k"),
          sum(expr("(f_e2 - 100 * y) * (f_e2 - 100 * y)")).as("sse_k"))
        .withColumn("rel_num", expr("(n_k * f_e2 - 100 * s_k) * (n_k * f_e2 - 100 * s_k)"))
        .withColumn("unc_num", expr("10000 * s_k * (n_k - s_k)"))
        .withColumn("identity_ok", expr(
          "case when n_k * sse_k = rel_num + unc_num then 1L else 0L end"))
      bins.agg(count(lit(1)).as("n_bins"),
          sum("n_k").as("n"),
          sum("sse_k").as("sse_total"),
          sum(expr("1L - identity_ok")).as("identity_violations"),
          sum("rel_num").as("rel_num_total"),
          sum("unc_num").as("unc_num_total"))
        .withColumn("brier_e6", expr("sse_total * 100 div n"))
        .select("n_bins", "n", "sse_total", "brier_e6",
          "identity_violations", "rel_num_total", "unc_num_total")
    }),

    // ── G363: CUPED variance reduction (pre-period covariate) ──────────
    // Unit: customer. Metric Y: orders in the LAST quarter of the
    // span; covariate X: orders in the three quarters before it
    // (data-anchored cuts). Treatment: md5 parity — a null experiment,
    // so the true effect is 0 and the adjusted difference estimates
    // it. θ = Cxy/Vx never materializes: with Vx = nΣx²−(Σx)² and
    // Cxy = nΣxy−ΣxΣy (both n²·moment scale) the adjusted difference
    // is raw_diff − Cxy·x_diff div Vx, and ρ² = Cxy²·10⁴ div (Vx·Vy)
    // lifts to DECIMAL(38,0) (Cxy² overflows BIGINT at this grain).
    "q418_cuped" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"), to_date(col("o_orderdate")).as("d"))
      val span = o.agg(min("d").as("d0"), max("d").as("d1"))
        .select(col("d0"), datediff(col("d1"), col("d0")).cast("long").as("sp"))
      val perC = o.crossJoin(broadcast(span))
        .select(col("c"),
          when(datediff(col("d"), col("d0")) * 4 <= expr("sp * 3"), 1L)
            .otherwise(0L).as("pre"))
        .groupBy("c")
        .agg(sum("pre").as("x"), sum(expr("1L - pre")).as("y"))
        .withColumn("t", expr(
          "pmod(md5_60(cast(c as string)), 2)"))
      val m = perC.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(expr("case when t = 1 then x else 0L end")).as("sx_t"),
        sum(expr("case when t = 1 then y else 0L end")).as("sy_t"))
      m.select(col("n"), col("n_t"), expr("n - n_t").as("n_c"),
          expr("n * sxx - sx * sx").as("vx"),
          expr("n * syy - sy * sy").as("vy"),
          expr("n * sxy - sx * sy").as("cxy"),
          expr("sx_t").as("sx_t"), expr("sy_t").as("sy_t"),
          expr("sx - sx_t").as("sx_c"), expr("sy - sy_t").as("sy_c"))
        .withColumn("rho2_e4", expr(
          """cast(cast(cxy as decimal(38, 0)) * cast(cxy as decimal(38, 0)) * 10000
            |  div (cast(vx as decimal(38, 0)) * cast(vy as decimal(38, 0)))
            |  as bigint)""".stripMargin))
        .withColumn("raw_diff_e6", expr(
          "(sy_t * n_c - sy_c * n_t) * 1000000 div (n_t * n_c)"))
        .withColumn("x_diff_e6", expr(
          "(sx_t * n_c - sx_c * n_t) * 1000000 div (n_t * n_c)"))
        .withColumn("adj_diff_e6", expr(
          "raw_diff_e6 - cxy * x_diff_e6 div vx"))
        .withColumn("var_reduction_e4", expr("10000 - rho2_e4"))
        .select("n", "n_t", "n_c", "vx", "vy", "cxy", "rho2_e4",
          "raw_diff_e6", "x_diff_e6", "adj_diff_e6", "var_reduction_e4")
    }),

    // ── G364: delete-one jackknife influence on a ratio ────────────────
    // R = Σ revenue / Σ orders (average order value, e2 = hundredths
    // of a cent). Deleting customer c gives R₍c₎ = (S − rev_c)·100
    // div (T − cnt_c) from the broadcast totals — O(m), never m
    // re-aggregations. The variance runs on CENTERED pseudo-values
    // d_c = R₍c₎ − R (shift-invariant, and Σ R₍c₎² at this scale
    // overflows BIGINT — the influences are 8 orders smaller than the
    // ratio). Emitted: jackknife bias (m−1)·Σd div m, variance
    // (m·Σd² − (Σd)²)(m−1) div m² in e4 units, and the single most
    // influential customer (deletion moves AOV furthest, ties to the
    // smaller key).
    "q419_jackknife_influence" -> ((s, dir) => {
      val perC = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("c"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev"),
          count(lit(1)).as("cnt"))
      val tot = perC.agg(sum("rev").as("s"), sum("cnt").as("t"),
        count(lit(1)).as("m"))
      val loo = perC.crossJoin(broadcast(tot))
        .withColumn("r_e2", expr("s * 100 div t"))
        .withColumn("d", expr("(s - rev) * 100 div (t - cnt) - r_e2"))
      val agg = loo.agg(
        max("m").as("m"), max("r_e2").as("r_e2"),
        sum("d").as("sum_d"),
        sum(expr("d * d")).as("sum_d2"),
        max(expr("abs(d)")).as("max_abs_infl_e2"))
      val worst = loo.crossJoin(broadcast(
          loo.agg(max(expr("abs(d)")).as("mx"))))
        .filter(expr("abs(d) = mx"))
        .agg(min("c").as("worst_customer"))
      agg
        .withColumn("rbar_jack_e2", expr("r_e2 + sum_d div m"))
        .withColumn("bias_jk_e2", expr("(m - 1) * sum_d div m"))
        .withColumn("jk_var_e4", expr(
          """cast((cast(m as decimal(38, 0)) * sum_d2 - cast(sum_d as decimal(38, 0))
            |  * sum_d) * (m - 1) div (cast(m as decimal(38, 0)) * m)
            |  as bigint)""".stripMargin))
        .crossJoin(broadcast(worst))
        .select("m", "r_e2", "rbar_jack_e2", "bias_jk_e2", "jk_var_e4",
          "max_abs_infl_e2", "worst_customer")
    }),

    // ── G365: Hampel filter series repair ──────────────────────────────
    // Per event type, daily counts on a dense spine; centered 7-day
    // window (full windows only). Flag when |x − med|·1000 >
    // 4448·MAD (3 × 1.4826, e3) — or ANY deviation when MAD = 0 (the
    // degenerate Hampel rule); repair to the median. Rolling median
    // and MAD from one sorted 7-array per row — (type)-partitioned
    // ROWS windows, never global. Repaired series xor-receipted.
    "q420_hampel_repair" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_type").as("t"))
      val span = ev.agg(min("d").as("d0"), max("d").as("d1"))
      val spine = ev.select("t").distinct().crossJoin(broadcast(span))
        .select(col("t"), explode(expr("sequence(d0, d1)")).as("d"), col("d0"))
      val daily = spine
        .join(ev.groupBy("t", "d").agg(count(lit(1)).as("x0")), Seq("t", "d"), "left")
        .select(col("t"), datediff(col("d"), col("d0")).cast("long").as("i"),
          coalesce(col("x0"), lit(0L)).as("x"))
      val w = Window.partitionBy("t").orderBy("i").rowsBetween(-3, 3)
      val nD = Window.partitionBy("t")
      val rep = daily
        .withColumn("h", array_sort(collect_list(col("x")).over(w)))
        .withColumn("n_t", count(lit(1)).over(nD))
        .filter(col("i") >= 3 && col("i") <= col("n_t") - 4)
        .withColumn("med", expr("element_at(h, 4)"))
        .withColumn("mad", expr(
          "element_at(array_sort(transform(h, v -> abs(v - med))), 4)"))
        .withColumn("flag", expr(
          """case when mad = 0 then (case when x != med then 1L else 0L end)
            |     when abs(x - med) * 1000 > 4448 * mad then 1L
            |     else 0L end""".stripMargin))
        .withColumn("xr", expr(
          "case when flag = 1L then med else x end"))
      rep.groupBy("t")
        .agg(count(lit(1)).as("n_scored"), sum("flag").as("n_flagged"),
          sum("x").as("sum_before"), sum("xr").as("sum_after"),
          expr("""bit_xor(md5_60(concat(t, ':', cast(i as string), ':',
                 cast(xr as string))))""").as("xor60_repaired"))
        .orderBy("t")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q417_brier_murphy" ->
      """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS y FROM orders),
        |cust AS (SELECT c, SUM(y) * 100 // COUNT(*) AS f_e2
        |         FROM o GROUP BY c),
        |sc AS (SELECT o.k, o.y, cust.f_e2 FROM o JOIN cust ON o.c = cust.c),
        |bins AS (SELECT f_e2, COUNT(*) AS n_k, SUM(y) AS s_k,
        |    SUM((f_e2 - 100 * y) * (f_e2 - 100 * y)) AS sse_k
        |  FROM sc GROUP BY f_e2),
        |b2 AS (SELECT *,
        |    (n_k * f_e2 - 100 * s_k) * (n_k * f_e2 - 100 * s_k) AS rel_num,
        |    10000 * s_k * (n_k - s_k) AS unc_num FROM bins)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(n_k) AS BIGINT) AS n,
        |  CAST(SUM(sse_k) AS BIGINT) AS sse_total,
        |  CAST(SUM(sse_k) * 100 // SUM(n_k) AS BIGINT) AS brier_e6,
        |  CAST(SUM(CASE WHEN n_k * sse_k = rel_num + unc_num
        |    THEN 0 ELSE 1 END) AS BIGINT) AS identity_violations,
        |  CAST(SUM(rel_num) AS BIGINT) AS rel_num_total,
        |  CAST(SUM(unc_num) AS BIGINT) AS unc_num_total
        |FROM b2""".stripMargin,

    "q418_cuped" ->
      """WITH o AS (SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |span AS (SELECT MIN(d) AS d0,
        |    date_diff('day', MIN(d), MAX(d)) AS sp FROM o),
        |pc AS (SELECT c,
        |    SUM(CASE WHEN date_diff('day', d0, d) * 4 <= sp * 3
        |        THEN 1 ELSE 0 END) AS x,
        |    SUM(CASE WHEN date_diff('day', d0, d) * 4 <= sp * 3
        |        THEN 0 ELSE 1 END) AS y,
        |    CAST('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 2 AS t
        |  FROM o, span GROUP BY c,
        |    CAST('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15) AS BIGINT) % 2),
        |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy,
        |    SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
        |    SUM(CASE WHEN t = 1 THEN x ELSE 0 END) AS sx_t,
        |    SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t
        |  FROM pc),
        |d AS (SELECT n, n_t, n - n_t AS n_c,
        |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |    n * sxy - sx * sy AS cxy, sx_t, sy_t,
        |    sx - sx_t AS sx_c, sy - sy_t AS sy_c FROM m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_t AS BIGINT) AS n_t,
        |  CAST(n_c AS BIGINT) AS n_c, CAST(vx AS BIGINT) AS vx,
        |  CAST(vy AS BIGINT) AS vy, CAST(cxy AS BIGINT) AS cxy,
        |  CAST(CAST(cxy AS HUGEINT) * CAST(cxy AS HUGEINT) * 10000
        |    // (CAST(vx AS HUGEINT) * CAST(vy AS HUGEINT)) AS BIGINT)
        |    AS rho2_e4,
        |  CAST((sy_t * n_c - sy_c * n_t) * 1000000 // (n_t * n_c) AS BIGINT)
        |    AS raw_diff_e6,
        |  CAST((sx_t * n_c - sx_c * n_t) * 1000000 // (n_t * n_c) AS BIGINT)
        |    AS x_diff_e6,
        |  CAST((sy_t * n_c - sy_c * n_t) * 1000000 // (n_t * n_c)
        |    - cxy * ((sx_t * n_c - sx_c * n_t) * 1000000 // (n_t * n_c))
        |      // vx AS BIGINT) AS adj_diff_e6,
        |  CAST(10000 - CAST(cxy AS HUGEINT) * CAST(cxy AS HUGEINT) * 10000
        |    // (CAST(vx AS HUGEINT) * CAST(vy AS HUGEINT)) AS BIGINT)
        |    AS var_reduction_e4
        |FROM d""".stripMargin,

    "q419_jackknife_influence" ->
      """WITH pc AS (SELECT o_custkey AS c,
        |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev,
        |    COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        |tot AS (SELECT SUM(rev) AS s, SUM(cnt) AS t, COUNT(*) AS m FROM pc),
        |loo AS (SELECT c, s * 100 // t AS r_e2,
        |    (s - rev) * 100 // (t - cnt) - s * 100 // t AS d
        |  FROM pc, tot),
        |ag AS (SELECT MAX(m) AS m, MAX(r_e2) AS r_e2,
        |    SUM(d) AS sum_d, SUM(d * d) AS sum_d2,
        |    MAX(ABS(d)) AS max_abs_infl_e2 FROM loo, tot),
        |wo AS (SELECT MIN(c) AS worst_customer FROM loo
        |       WHERE ABS(d) = (SELECT MAX(ABS(d)) FROM loo))
        |SELECT CAST(m AS BIGINT) AS m, CAST(r_e2 AS BIGINT) AS r_e2,
        |  CAST(r_e2 + sum_d // m AS BIGINT) AS rbar_jack_e2,
        |  CAST((m - 1) * sum_d // m AS BIGINT) AS bias_jk_e2,
        |  CAST((CAST(m AS HUGEINT) * sum_d2 - CAST(sum_d AS HUGEINT) * sum_d)
        |    * (m - 1) // (CAST(m AS HUGEINT) * m) AS BIGINT) AS jk_var_e4,
        |  CAST(max_abs_infl_e2 AS BIGINT) AS max_abs_infl_e2,
        |  CAST(worst_customer AS BIGINT) AS worst_customer
        |FROM ag, wo""".stripMargin,

    "q420_hampel_repair" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_type AS t
        |  FROM events),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ev),
        |spine AS (SELECT t, UNNEST(range(0, date_diff('day', d0, d1) + 1))
        |    AS i FROM (SELECT DISTINCT t FROM ev) ty, span),
        |cnt AS (SELECT t, date_diff('day', d0, d) AS i, COUNT(*) AS x
        |        FROM ev, span GROUP BY t, date_diff('day', d0, d)),
        |daily AS (SELECT s.t, s.i, COALESCE(c.x, 0) AS x
        |          FROM spine s LEFT JOIN cnt c ON s.t = c.t AND s.i = c.i),
        |nd AS (SELECT t, COUNT(*) AS n_t FROM daily GROUP BY t),
        |hw AS (SELECT t, i, x, list_sort(list(x) OVER
        |    (PARTITION BY t ORDER BY i
        |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS h
        |  FROM daily),
        |sc AS (SELECT hw.t, hw.i, hw.x, h[4] AS med,
        |    list_sort(list_transform(h, v -> ABS(v - h[4])))[4] AS mad
        |  FROM hw JOIN nd ON hw.t = nd.t
        |  WHERE hw.i >= 3 AND hw.i <= nd.n_t - 4),
        |fl AS (SELECT t, i, x, med, mad,
        |    CASE WHEN mad = 0 THEN (CASE WHEN x != med THEN 1 ELSE 0 END)
        |         WHEN ABS(x - med) * 1000 > 4448 * mad THEN 1 ELSE 0 END
        |      AS flag FROM sc),
        |rp AS (SELECT t, i, x, flag,
        |    CASE WHEN flag = 1 THEN med ELSE x END AS xr FROM fl)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  CAST(SUM(flag) AS BIGINT) AS n_flagged,
        |  CAST(SUM(x) AS BIGINT) AS sum_before,
        |  CAST(SUM(xr) AS BIGINT) AS sum_after,
        |  bit_xor(CAST('0x' || substr(md5(t || ':' || CAST(i AS VARCHAR)
        |    || ':' || CAST(xr AS VARCHAR)), 1, 15) AS BIGINT))
        |    AS xor60_repaired
        |FROM rp GROUP BY t ORDER BY t""".stripMargin
  )
}
