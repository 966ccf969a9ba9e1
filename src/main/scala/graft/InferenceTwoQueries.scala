package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inference-completion wave (round 10, sixty-fifth wave): split
  * conformal prediction intervals, doubly-robust off-policy
  * evaluation, a distribution-free median confidence interval, and
  * Wald's sequential probability ratio test.
  *
  * Reference intent: the reference serves Prophet point forecasts
  * with no interval (services/forecast-service/app/main.py) and
  * ranks/serves with no sequential or counterfactual evaluation at
  * all. q433 wraps q410's trailing-median forecaster in a SPLIT
  * CONFORMAL interval (Vovk et al. 2005; Lei et al. 2018): the
  * (⌈(n+1)(1−α)⌉)-th order statistic of calibration residuals is the
  * half-width, and realized test coverage is measured, not assumed.
  * q434 completes q408's IPS estimator with the DOUBLY-ROBUST form
  * (Dudík, Langford & Li, ICML 2011): direct-model value plus the
  * propensity-weighted residual correction — unbiased if EITHER the
  * reward model or the propensity is right. q435 is the
  * distribution-free median CI from binomial order statistics
  * (ranks n/2 ∓ z√n/2): exact integers with the single floor-sqrt
  * allowed by q401's one-op-double discipline. q436 is Wald's SPRT
  * (Wald 1945) folded over each nation's order stream in arrival
  * order — log-likelihood increments and boundaries ln(19) as e6
  * design literals, decisions frozen at first crossing.
  */
object InferenceTwoQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G378: split conformal interval on the trailing-median forecast ──
    // Per priority, daily order counts on the dense zero-filled spine
    // (q410's fixture). Point forecast f_i = trailing-28 median.
    // Scored days i ≥ 28 split by time at 80 %: calibration first,
    // test after (a time split, not random — leakage-safe, q217's
    // rule). Nonconformity = |y − f|; half-width q̂ = the
    // ⌈(n_cal+1)·0.8⌉-th smallest calibration residual (α = 0.2,
    // rank clamped to n_cal — the clamp only fires when n_cal < 4,
    // where the interval is vacuous anyway). Coverage on the test
    // window is EMITTED — the conformal guarantee is marginal, so the
    // number is reported, not asserted.
    "q433_conformal_interval" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("pri"),
          to_date(col("o_orderdate")).as("d"))
      val span = o.agg(min("d").as("d0"), max("d").as("d1"))
      val spine = o.select("pri").distinct().crossJoin(broadcast(span))
        .select(col("pri"), explode(expr("sequence(d0, d1)")).as("d"),
          col("d0"), col("d1"))
      val daily = spine
        .join(o.groupBy("pri", "d").agg(count(lit(1)).as("y0")),
          Seq("pri", "d"), "left")
        .select(col("pri"),
          datediff(col("d"), col("d0")).cast("long").as("i"),
          datediff(col("d1"), col("d0")).cast("long").as("t"),
          coalesce(col("y0"), lit(0L)).as("y"))
      val w = Window.partitionBy("pri").orderBy("i").rowsBetween(-28, -1)
      val scored = daily
        .withColumn("hist", array_sort(collect_list(col("y")).over(w)))
        .withColumn("f", expr("element_at(hist, 14)"))
        .filter(col("i") >= 28)
        .withColumn("res", abs(col("y") - col("f")))
        .withColumn("cut", expr("28 + (t - 28) * 8 div 10"))
      val cal = scored.filter(col("i") <= col("cut"))
        .groupBy("pri")
        .agg(count(lit(1)).as("n_cal"),
          array_sort(collect_list(col("res"))).as("rs"))
        .withColumn("k", expr("((n_cal + 1) * 8 + 9) div 10"))
        .withColumn("qhat", expr("element_at(rs, cast(least(k, n_cal) as int))"))
        .select("pri", "n_cal", "qhat")
      scored.filter(col("i") > col("cut"))
        .join(broadcast(cal), "pri")
        .groupBy("pri")
        .agg(max("n_cal").as("n_cal"), count(lit(1)).as("n_test"),
          max("qhat").as("qhat"),
          sum(expr("case when y between f - qhat and f + qhat " +
            "then 1L else 0L end")).as("n_covered"))
        .withColumn("coverage_e4", expr("n_covered * 10000 div n_test"))
        .select("pri", "n_cal", "n_test", "qhat", "n_covered", "coverage_e4")
        .orderBy("pri")
    }),

    // ── G379: doubly-robust off-policy value ───────────────────────────
    // q408's logged-bandit fixture verbatim: actions = event types,
    // reward = purchase within 1 h downstream, target policy π(u) =
    // the user's modal action, propensity p̂(a) = n_a/n (the global
    // logging frequency). Direct model Q̂(a) = mean reward of action
    // a. V_DR = (1/n)·Σ[Q̂(π(u)) + 1{a=π(u)}·(r−Q̂(a))/p̂(a)] — the
    // correction aggregates per ACTION as n·(rm_a·n_a − m_a·rall_a)
    // ·10⁶ div n_a², DECIMAL-lifted because the numerator clears
    // BIGINT at sf0.1. Emitted beside v_behavior/v_dm/v_ips so the
    // estimator family sits on one row.
    "q434_doubly_robust" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), col("event_type").as("a"),
          unix_micros(col("ts")).as("us"), col("event_id").as("eid"))
      val wNext = Window.partitionBy("u")
        .orderBy(col("us").asc, col("eid").asc)
        .rowsBetween(1, Window.unboundedFollowing)
      val rewarded = ev
        .withColumn("np", min(when(col("a") === "purchase", col("us"))).over(wNext))
        .withColumn("r", when(
          col("np").isNotNull && col("np") <= col("us") + 3600000000L, 1L)
          .otherwise(0L))
      val wPi = Window.partitionBy("u").orderBy(col("cnt").desc, col("a").asc)
      val pi = ev.groupBy("u", "a").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wPi))
        .filter(col("rk") === 1).select(col("u"), col("a").as("pi_a"))
      val na = rewarded.groupBy("a")
        .agg(count(lit(1)).as("n_a"), sum("r").as("rall_a"))
      val nTot = na.agg(sum("n_a").as("n"), sum("rall_a").as("r_total"))
      val scored = rewarded.join(pi, "u")
      // direct-method arm: rows priced at the TARGET action's model value
      val dm = scored.groupBy(col("pi_a").as("a"))
        .agg(count(lit(1)).as("cnt_b"))
        .join(broadcast(na), "a")
        .agg(sum(expr("cnt_b * rall_a * 1000000 div n_a")).as("dm_sum_e6"))
      // correction arm: matched rows only, residual over propensity
      val corr = scored.filter(col("a") === col("pi_a"))
        .groupBy("a")
        .agg(count(lit(1)).as("m_a"), sum("r").as("rm_a"))
        .join(broadcast(na), "a")
        .crossJoin(broadcast(nTot))
        .agg(sum(expr(
          """cast(cast(n as decimal(38, 0)) * (rm_a * n_a - m_a * rall_a)
            |  * 1000000 div (n_a * n_a) as bigint)""".stripMargin))
          .as("corr_sum_e6"),
          sum("m_a").as("n_matched"),
          sum(expr("rm_a * 1000000 div n_a")).as("v_ips_e6"))
      dm.crossJoin(broadcast(corr)).crossJoin(broadcast(nTot))
        .select(col("n"), col("n_matched"),
          expr("r_total * 1000000 div n").as("v_behavior_e6"),
          expr("dm_sum_e6 div n").as("v_dm_e6"),
          col("v_ips_e6"),
          expr("corr_sum_e6 div n").as("corr_e6"),
          expr("(dm_sum_e6 + corr_sum_e6) div n").as("v_dr_e6"))
    }),

    // ── G380: distribution-free median CI (binomial order statistics) ──
    // Per nation, order totals in cents. The CI for the median needs
    // no distributional assumption: ranks l = ⌊(n − z√n)/2⌋ and
    // u = ⌈(n + z√n)/2⌉ + 1 bracket the median with ~95 % confidence
    // (z = 1.96; Conover, Practical Nonparametric Statistics §3.2).
    // √n lands in ONE floor-sqrt at e2 (q401's one-op-double rule);
    // everything else is exact integer. Rank → value selection runs
    // per nation on a PARTITIONED row_number — never a global sort —
    // and the certificate ci_lo ≤ median ≤ ci_hi is emitted per row.
    "q435_median_ci" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey").as("okey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val rows = o.join(c, "o_custkey")
      val ranked = rows.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("cents", "okey")))
      val ranks = rows.groupBy("g").agg(count(lit(1)).as("n"))
        .withColumn("s2", expr(
          "cast(floor(sqrt(cast(n * 10000 as double))) as bigint)"))
        .withColumn("lo_rank", expr("greatest(1L, (n * 10000 - 196 * s2) div 20000)"))
        .withColumn("hi_rank", expr(
          "least(n, (n * 10000 + 196 * s2 + 19999) div 20000 + 1)"))
        .withColumn("med_rank", expr("(n + 1) div 2"))
      ranked.join(broadcast(ranks), "g")
        .filter(col("rn") === col("lo_rank") || col("rn") === col("med_rank") ||
          col("rn") === col("hi_rank"))
        .groupBy("g")
        .agg(max("n").as("n"), max("lo_rank").as("lo_rank"),
          max("hi_rank").as("hi_rank"),
          max(when(col("rn") === col("lo_rank"), col("cents"))).as("ci_lo_cents"),
          max(when(col("rn") === col("med_rank"), col("cents"))).as("median_cents"),
          max(when(col("rn") === col("hi_rank"), col("cents"))).as("ci_hi_cents"))
        .withColumn("width_cents", expr("ci_hi_cents - ci_lo_cents"))
        .withColumn("contains_median", expr(
          "case when ci_lo_cents <= median_cents and median_cents <= ci_hi_cents " +
            "then 1L else 0L end"))
        .select("g", "n", "lo_rank", "hi_rank", "ci_lo_cents", "median_cents",
          "ci_hi_cents", "width_cents", "contains_median")
        .orderBy("g")
    }),

    // ── G381: Wald's SPRT over each nation's order stream ──────────────
    // H0: urgent-order rate p₀ = 0.38 vs H1: p₁ = 0.42 (the corpus
    // runs ≈ 0.40 — between the hypotheses, so the walk is
    // near-martingale and only sampling noise decides: some nations
    // cross, some never do, and both outcomes are emitted honestly).
    // LLR increments are e6 design literals: ln(42/38) = +100083,
    // ln(58/62) = −66691; boundaries ±ln(19) = ±2944439 (α = β =
    // 0.05). The fold freezes at first crossing (decision 2 = accept
    // H1, 1 = accept H0, 0 = still sampling at data end). Sequential
    // tests are inherently per-key serial — the parallelism is ACROSS
    // the 25 nations, and the per-key array fold is the same shape a
    // 1000-executor cluster runs per key after one hash shuffle.
    "q436_sprt" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey").as("k"),
          to_date(col("o_orderdate")).as("d"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("y"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val step = "(case when z.y = 1L then 100083L else -66691L end)"
      o.join(c, "o_custkey").groupBy("g")
        .agg(expr("array_sort(collect_list(struct(d, k, y)))").as("xs"),
          count(lit(1)).as("n"), sum("y").as("s"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('llr', 0L, 'dec', 0L, 'nd', 0L, 'i', 0L),
             |  (acc, z) -> case when acc.dec != 0L then acc
             |    else named_struct(
             |      'llr', acc.llr + $step,
             |      'dec', case when acc.llr + $step >= 2944439L then 2L
             |                  when acc.llr + $step <= -2944439L then 1L
             |                  else 0L end,
             |      'nd', case when acc.llr + $step >= 2944439L
             |                   or acc.llr + $step <= -2944439L
             |                 then acc.i + 1L else 0L end,
             |      'i', acc.i + 1L) end)""".stripMargin))
        .select(col("g"), col("n"), col("s"),
          expr("st.dec").as("decision"),
          expr("st.nd").as("n_at_decision"),
          expr("st.llr").as("llr_final_e6"))
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q433_conformal_interval" ->
      """WITH o AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS d FROM orders),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1,
        |    date_diff('day', MIN(d), MAX(d)) AS t FROM o),
        |spine AS (SELECT pri, UNNEST(range(0,
        |    date_diff('day', d0, d1) + 1)) AS i
        |  FROM (SELECT DISTINCT pri FROM o) p, span),
        |cnt AS (SELECT pri, date_diff('day', d0, d) AS i, COUNT(*) AS y
        |        FROM o, span GROUP BY pri, date_diff('day', d0, d)),
        |daily AS (SELECT s.pri, s.i, COALESCE(c.y, 0) AS y
        |          FROM spine s LEFT JOIN cnt c ON s.pri = c.pri AND s.i = c.i),
        |hist AS (SELECT pri, i, y, list_sort(list(y) OVER
        |    (PARTITION BY pri ORDER BY i
        |     ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)) AS h
        |  FROM daily),
        |sc AS (SELECT pri, i, y, h[14] AS f, ABS(y - h[14]) AS res,
        |    28 + (t - 28) * 8 // 10 AS cut
        |  FROM hist, span WHERE i >= 28),
        |cal AS (SELECT pri, COUNT(*) AS n_cal,
        |    list_sort(list(res)) AS rs FROM sc WHERE i <= cut GROUP BY pri),
        |q AS (SELECT pri, n_cal,
        |    rs[CAST(LEAST(((n_cal + 1) * 8 + 9) // 10, n_cal) AS INT)] AS qhat
        |  FROM cal)
        |SELECT sc.pri, CAST(MAX(q.n_cal) AS BIGINT) AS n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(MAX(q.qhat) AS BIGINT) AS qhat,
        |  CAST(SUM(CASE WHEN sc.y BETWEEN sc.f - q.qhat AND sc.f + q.qhat
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(SUM(CASE WHEN sc.y BETWEEN sc.f - q.qhat AND sc.f + q.qhat
        |    THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS coverage_e4
        |FROM sc JOIN q ON sc.pri = q.pri WHERE sc.i > sc.cut
        |GROUP BY sc.pri ORDER BY sc.pri""".stripMargin,

    "q434_doubly_robust" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS a, epoch_us(ts) AS us,
        |    event_id AS eid FROM events),
        |rew AS (SELECT u, a, us, eid,
        |    CASE WHEN MIN(CASE WHEN a = 'purchase' THEN us END) OVER
        |      (PARTITION BY u ORDER BY us, eid
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      <= us + 3600000000 THEN 1 ELSE 0 END AS r
        |  FROM ev),
        |pi AS (SELECT u, a AS pi_a FROM (
        |    SELECT u, a, ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY COUNT(*) DESC, a ASC) AS rk
        |    FROM ev GROUP BY u, a) z WHERE rk = 1),
        |na AS (SELECT a, COUNT(*) AS n_a, SUM(r) AS rall_a FROM rew GROUP BY a),
        |nt AS (SELECT SUM(n_a) AS n, SUM(rall_a) AS r_total FROM na),
        |sc AS (SELECT rew.*, pi.pi_a FROM rew JOIN pi ON rew.u = pi.u),
        |dm AS (SELECT SUM(cnt_b * rall_a * 1000000 // n_a) AS dm_sum_e6 FROM (
        |    SELECT pi_a AS a, COUNT(*) AS cnt_b FROM sc GROUP BY pi_a) b
        |  JOIN na ON b.a = na.a),
        |corr AS (SELECT
        |    SUM(CAST(CAST(nt.n AS HUGEINT) * (m.rm_a * na.n_a - m.m_a * na.rall_a)
        |      * 1000000 // (na.n_a * na.n_a) AS BIGINT)) AS corr_sum_e6,
        |    SUM(m.m_a) AS n_matched,
        |    SUM(m.rm_a * 1000000 // na.n_a) AS v_ips_e6
        |  FROM (SELECT a, COUNT(*) AS m_a, SUM(r) AS rm_a FROM sc
        |        WHERE a = pi_a GROUP BY a) m
        |  JOIN na ON m.a = na.a, nt)
        |SELECT CAST(nt.n AS BIGINT) AS n,
        |  CAST(corr.n_matched AS BIGINT) AS n_matched,
        |  CAST(nt.r_total * 1000000 // nt.n AS BIGINT) AS v_behavior_e6,
        |  CAST(dm.dm_sum_e6 // nt.n AS BIGINT) AS v_dm_e6,
        |  CAST(corr.v_ips_e6 AS BIGINT) AS v_ips_e6,
        |  CAST(corr.corr_sum_e6 // nt.n AS BIGINT) AS corr_e6,
        |  CAST((dm.dm_sum_e6 + corr.corr_sum_e6) // nt.n AS BIGINT) AS v_dr_e6
        |FROM nt, dm, corr""".stripMargin,

    "q435_median_ci" ->
      """WITH o AS (SELECT o.o_orderkey AS okey, c.c_nationkey AS g,
        |    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |rk AS (SELECT g, cents,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY cents, okey) AS rn
        |  FROM o),
        |nn AS (SELECT g, COUNT(*) AS n,
        |    CAST(FLOOR(SQRT(CAST(COUNT(*) * 10000 AS DOUBLE))) AS BIGINT) AS s2
        |  FROM o GROUP BY g),
        |bounds AS (SELECT g, n,
        |    GREATEST(1, (n * 10000 - 196 * s2) // 20000) AS lo_rank,
        |    LEAST(n, (n * 10000 + 196 * s2 + 19999) // 20000 + 1) AS hi_rank,
        |    (n + 1) // 2 AS med_rank
        |  FROM nn)
        |SELECT b.g, CAST(b.n AS BIGINT) AS n,
        |  CAST(b.lo_rank AS BIGINT) AS lo_rank,
        |  CAST(b.hi_rank AS BIGINT) AS hi_rank,
        |  CAST(MAX(CASE WHEN rk.rn = b.lo_rank THEN rk.cents END) AS BIGINT)
        |    AS ci_lo_cents,
        |  CAST(MAX(CASE WHEN rk.rn = b.med_rank THEN rk.cents END) AS BIGINT)
        |    AS median_cents,
        |  CAST(MAX(CASE WHEN rk.rn = b.hi_rank THEN rk.cents END) AS BIGINT)
        |    AS ci_hi_cents,
        |  CAST(MAX(CASE WHEN rk.rn = b.hi_rank THEN rk.cents END)
        |    - MAX(CASE WHEN rk.rn = b.lo_rank THEN rk.cents END) AS BIGINT)
        |    AS width_cents,
        |  CAST(CASE WHEN MAX(CASE WHEN rk.rn = b.lo_rank THEN rk.cents END)
        |      <= MAX(CASE WHEN rk.rn = b.med_rank THEN rk.cents END)
        |    AND MAX(CASE WHEN rk.rn = b.med_rank THEN rk.cents END)
        |      <= MAX(CASE WHEN rk.rn = b.hi_rank THEN rk.cents END)
        |    THEN 1 ELSE 0 END AS BIGINT) AS contains_median
        |FROM bounds b JOIN rk ON rk.g = b.g
        |  AND (rk.rn = b.lo_rank OR rk.rn = b.med_rank OR rk.rn = b.hi_rank)
        |GROUP BY b.g, b.n, b.lo_rank, b.hi_rank
        |ORDER BY b.g""".stripMargin,

    // The oracle deliberately does NOT replay the Spark fold: the SPRT
    // llr is a prefix sum and the stopping decision is its FIRST
    // bound-crossing, so the whole sequential test collapses to one
    // windowed cumulative sum + MIN(i) over crossings — an independent
    // closed form that must agree with the fold sample-for-sample (the
    // r10 recursive replay re-ran the orders⋈customer join once per
    // recursion step and took 181 s at sf0.1; this runs in under a
    // second and is a stronger check because the two formulations share
    // no code shape).
    "q436_sprt" ->
      """WITH o AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    o.o_orderkey AS k, CAST(o.o_orderdate AS DATE) AS d,
        |    CASE WHEN CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |seq AS MATERIALIZED (SELECT g, y,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY d, k) AS i,
        |    SUM(CASE WHEN y = 1 THEN 100083 ELSE -66691 END)
        |      OVER (PARTITION BY g ORDER BY d, k
        |            ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM o),
        |ng AS (SELECT g, COUNT(*) AS n, SUM(y) AS s FROM o GROUP BY g),
        |cr AS (SELECT g, MIN(i) AS istar FROM seq
        |       WHERE cum >= 2944439 OR cum <= -2944439 GROUP BY g),
        |dec AS (SELECT s.g, s.i AS nd, s.cum,
        |    CASE WHEN s.cum >= 2944439 THEN 2 ELSE 1 END AS decision
        |  FROM seq s JOIN cr ON s.g = cr.g AND s.i = cr.istar),
        |lastv AS (SELECT s.g, s.cum AS cum_last
        |  FROM seq s JOIN ng ON s.g = ng.g AND s.i = ng.n)
        |SELECT ng.g, CAST(ng.n AS BIGINT) AS n, CAST(ng.s AS BIGINT) AS s,
        |  CAST(COALESCE(dec.decision, 0) AS BIGINT) AS decision,
        |  CAST(COALESCE(dec.nd, 0) AS BIGINT) AS n_at_decision,
        |  CAST(COALESCE(dec.cum, lastv.cum_last) AS BIGINT) AS llr_final_e6
        |FROM ng LEFT JOIN dec ON ng.g = dec.g
        |JOIN lastv ON ng.g = lastv.g ORDER BY ng.g""".stripMargin
  )
}
