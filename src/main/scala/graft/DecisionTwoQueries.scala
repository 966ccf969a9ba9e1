package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decision-support II subsystem (round 10, forty-fifth wave): McNemar
  * paired-classifier comparison, empirical-Bayes rate shrinkage,
  * cohort lifetime value, and cost-sensitive threshold selection.
  *
  * Reference intent: the reference picks its per-store model by a
  * single RMSE comparison (services/training-service/app/train_utils.py
  * :94-114) — no significance test, no cost asymmetry, raw per-key
  * rates. These four land the missing decision layer: McNemar is THE
  * correct test for two classifiers scored on the SAME examples (the
  * discordant pairs carry all the evidence); EB shrinkage is how a
  * pipeline publishes per-item rates without small-n noise (the
  * smoothed-CTR pattern); cohort LTV turns the order log into the
  * number marketing actually buys against; and the threshold sweep
  * replaces "0.5" with the cost-minimizing cut. House discipline:
  * exact integer cents/e4/e6 arithmetic, nearest-rank order statistics
  * from distributedNtile (never a global window), documented floors.
  */
object DecisionTwoQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G298: McNemar paired-classifier test ───────────────────────────
    // Two deterministic rules predict o_orderstatus = 'F' on every
    // order: A = "value strictly above the median", B = "priority is
    // urgent/high". Both rules score the SAME rows, so the comparison
    // must condition on the agreement cells — McNemar's statistic
    // (b−c)²/(b+c) over the discordant counts only. Exact decision:
    // (b−c)²·10⁴ > 38416·(b+c) ⟺ χ² > 3.8416 (the 95% point as a
    // design-time literal, q283's precedent). The median is the
    // nearest-rank order statistic via distributedNtile(2) — the first
    // bucket holds ceil(N/2) rows, so its max IS rank ⌈N/2⌉ — never a
    // global window.
    "q353_mcnemar" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"),
        (col("o_orderstatus") === "F").as("y"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("pred_b"))
      val n = o.agg(count(lit(1)).as("n_total"))
      val med = graft.ops.Relational
        .distributedNtile(o, Seq(col("v_c"), col("k")), 2, n, "bk")
        .filter(col("bk") === 1).agg(max("v_c").as("med_c"))
      o.crossJoin(broadcast(med))
        .withColumn("pred_a", col("v_c") > col("med_c"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_a") === col("y") && col("pred_b") =!= col("y"), 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("pred_a") =!= col("y") && col("pred_b") === col("y"), 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("pred_a") === col("y"), 1L).otherwise(0L)).as("n_a_correct"),
          sum(when(col("pred_b") === col("y"), 1L).otherwise(0L)).as("n_b_correct"))
        .withColumn("stat_e4", expr("(b - c) * (b - c) * 10000 div greatest(b + c, 1)"))
        .withColumn("significant", expr("(b - c) * (b - c) * 10000 > 38416 * (b + c)"))
        .withColumn("acc_a_e4", expr("n_a_correct * 10000 div n"))
        .withColumn("acc_b_e4", expr("n_b_correct * 10000 div n"))
        .select("n", "b", "c", "stat_e4", "significant", "acc_a_e4", "acc_b_e4")
    }),

    // ── G299: empirical-Bayes Beta shrinkage of per-part return rates ──
    // Per part: x returns out of n lineitems. The Beta prior comes from
    // the data by method of moments over the per-part e6 rates
    // (m = mean, v = variance, α+β = m(1−m)/v − 1, floored and clamped
    // ≥ 1 — overdispersed data would push it negative, where shrinkage
    // honestly degenerates to none). Published rate = (x·10⁶ + m_e6·ab)
    // div (n + ab): small-n parts collapse to the prior mean, large-n
    // parts keep their evidence — exactly the smoothed-CTR estimator.
    // Output: the 10 parts the prior moves MOST (the small-n outliers),
    // with the prior parameters alongside. Part grain throughout after
    // one corpus groupBy.
    "q354_eb_shrinkage" -> ((s, dir) => {
      val parts = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("p"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
        .withColumn("pe6", expr("x * 1000000 div n"))
      val prior = parts.agg(count(lit(1)).as("np"),
          sum("pe6").as("m1"), sum(expr("pe6 * pe6")).as("m2"))
        .withColumn("m_e6", expr("m1 div np"))
        // np·m2 and m1² reach ~1e20 at part-catalog scale — DECIMAL(38,0)
        // (HUGEINT in the mirror), back to BIGINT after the floor-div
        .withColumn("var_e12", expr(
          "cast((cast(np as decimal(38,0)) * m2 - cast(m1 as decimal(38,0)) * m1)" +
            " div (cast(np as decimal(38,0)) * np) as bigint)"))
        .withColumn("ab", expr(
          "greatest(m_e6 * (1000000 - m_e6) div greatest(var_e12, 1) - 1, 1)"))
        .select("m_e6", "var_e12", "ab")
      parts.crossJoin(broadcast(prior))
        .withColumn("shrunk_e6", expr("(x * 1000000 + m_e6 * ab) div (n + ab)"))
        .withColumn("moved_e6", expr("abs(pe6 - shrunk_e6)"))
        .orderBy(col("moved_e6").desc, col("p").asc)
        .limit(10)
        .select("p", "n", "x", "pe6", "shrunk_e6", "moved_e6", "m_e6", "ab")
    }),

    // ── G300: cohort lifetime value (first-180-days realized LTV) ──────
    // Customers cohorted by first-order quarter; each cohort's realized
    // 180-day LTV = revenue inside [first, first+180) per customer,
    // repeat rate = share with ≥ 2 orders in the window. Only cohorts
    // whose full 180-day window fits inside the corpus are emitted —
    // a truncated window would understate LTV for recent cohorts (the
    // classic dashboard bug; the cutoff is data-anchored on max date).
    // One customer-grain groupBy + one broadcast-anchored corpus join.
    "q355_cohort_ltv" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("cust"), to_date(col("o_orderdate")).as("d"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"))
      val firsts = o.groupBy("cust").agg(min("d").as("d0"))
      val mx = o.agg(max("d").as("maxd"))
      val eligible = firsts.crossJoin(broadcast(mx))
        .filter(expr("d0 <= date_sub(maxd, 180)"))
        .select("cust", "d0")
      val windowed = o.join(eligible, Seq("cust"))
        .filter(expr("d >= d0 and d < date_add(d0, 180)"))
        .groupBy("cust", "d0")
        .agg(count(lit(1)).as("n_orders"), sum("v_c").as("rev_c"))
      windowed
        .groupBy(expr("concat(year(d0), '-Q', quarter(d0))").as("cohort"))
        .agg(count(lit(1)).as("n_customers"),
          expr("sum(rev_c) div count(1)").as("ltv_c"),
          expr("sum(case when n_orders >= 2 then 1 else 0 end) * 10000 div count(1)")
            .as("repeat_e4"))
        .orderBy("cohort")
    }),

    // ── G301: cost-sensitive threshold selection ───────────────────────
    // Predicting o_orderstatus = 'F' from order value with FN 5× as
    // costly as FP: sweep the nine exact decile boundaries of the score
    // (distributedNtile(10) bucket maxima — bit-identical to a global
    // ntile, computed parallel), evaluate total cost FP + 5·FN at each
    // threshold in ONE pass over the broadcast-fanned corpus, and emit
    // the full operating table with the argmin flagged (ties → lowest
    // threshold). The "sweep thresholds on a broadcast ladder" shape is
    // how any cost curve / ROC table scales: candidate cuts are tiny,
    // the corpus is scanned once.
    "q356_cost_threshold" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"),
        (col("o_orderstatus") === "F").as("y"))
      val n = o.agg(count(lit(1)).as("n_total"))
      val cuts = graft.ops.Relational
        .distributedNtile(o, Seq(col("v_c"), col("k")), 10, n, "bk")
        .filter(col("bk") <= 9)
        .groupBy("bk").agg(max("v_c").as("cut_c"))
        .select("bk", "cut_c")
      val costs = o.crossJoin(broadcast(cuts))
        .groupBy("bk", "cut_c")
        .agg(sum(when(col("v_c") > col("cut_c") && !col("y"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("v_c") <= col("cut_c") && col("y"), 1L).otherwise(0L)).as("fn"))
        .withColumn("cost", expr("fp + 5 * fn"))
      val best = costs.agg(min(struct(col("cost"), col("cut_c"))).as("b"))
        .select(col("b.cut_c").as("best_cut"))
      costs.crossJoin(broadcast(best))
        .withColumn("is_best", col("cut_c") === col("best_cut"))
        .select(col("bk").cast(LongType).as("decile"), col("cut_c"), col("fp"),
          col("fn"), col("cost"), col("is_best"))
        .orderBy("decile")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q353_mcnemar" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c,
        |             o_orderstatus = 'F' AS y,
        |             o_orderpriority IN ('1-URGENT', '2-HIGH') AS pred_b
        |           FROM orders),
        |bk AS (SELECT *, ntile(2) OVER (ORDER BY v_c, k) AS bk FROM o),
        |med AS (SELECT MAX(v_c) AS med_c FROM bk WHERE bk = 1),
        |cls AS (SELECT *, v_c > med_c AS pred_a FROM o, med),
        |agg AS (SELECT COUNT(*) AS n,
        |          SUM(CASE WHEN pred_a = y AND pred_b != y THEN 1 ELSE 0 END) AS b,
        |          SUM(CASE WHEN pred_a != y AND pred_b = y THEN 1 ELSE 0 END) AS c,
        |          SUM(CASE WHEN pred_a = y THEN 1 ELSE 0 END) AS na,
        |          SUM(CASE WHEN pred_b = y THEN 1 ELSE 0 END) AS nb
        |        FROM cls)
        |SELECT CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
        |       CAST((b - c) * (b - c) * 10000 // GREATEST(b + c, 1) AS BIGINT) AS stat_e4,
        |       (b - c) * (b - c) * 10000 > 38416 * (b + c) AS significant,
        |       CAST(na * 10000 // n AS BIGINT) AS acc_a_e4,
        |       CAST(nb * 10000 // n AS BIGINT) AS acc_b_e4
        |FROM agg""".stripMargin,

    "q354_eb_shrinkage" ->
      """WITH parts AS (SELECT l_partkey AS p, COUNT(*) AS n,
        |                 SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
        |               FROM lineitem GROUP BY 1),
        |pe AS (SELECT p, n, x, x * 1000000 // n AS pe6 FROM parts),
        |prior AS (SELECT COUNT(*) AS np, SUM(pe6) AS m1, SUM(pe6 * pe6) AS m2 FROM pe),
        |pp AS (SELECT m1 // np AS m_e6,
        |              CAST((CAST(np AS HUGEINT) * m2 - CAST(m1 AS HUGEINT) * m1)
        |                // (CAST(np AS HUGEINT) * np) AS BIGINT) AS var_e12
        |       FROM prior),
        |ab AS (SELECT m_e6, var_e12,
        |         GREATEST(m_e6 * (1000000 - m_e6) // GREATEST(var_e12, 1) - 1, 1) AS ab
        |       FROM pp),
        |sh AS (SELECT p, n, x, pe6,
        |         (x * 1000000 + m_e6 * ab) // (n + ab) AS shrunk_e6,
        |         ABS(pe6 - (x * 1000000 + m_e6 * ab) // (n + ab)) AS moved_e6,
        |         m_e6, ab
        |       FROM pe, ab)
        |SELECT CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
        |       CAST(pe6 AS BIGINT) AS pe6, CAST(shrunk_e6 AS BIGINT) AS shrunk_e6,
        |       CAST(moved_e6 AS BIGINT) AS moved_e6,
        |       CAST(m_e6 AS BIGINT) AS m_e6, CAST(ab AS BIGINT) AS ab
        |FROM sh ORDER BY moved_e6 DESC, p ASC LIMIT 10""".stripMargin,

    "q355_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c
        |           FROM orders),
        |firsts AS (SELECT cust, MIN(d) AS d0 FROM o GROUP BY cust),
        |mx AS (SELECT MAX(d) AS maxd FROM o),
        |eligible AS (SELECT cust, d0 FROM firsts, mx WHERE d0 <= maxd - 180),
        |w AS (SELECT o.cust, d0, COUNT(*) AS n_orders, SUM(v_c) AS rev_c
        |      FROM o JOIN eligible ON o.cust = eligible.cust
        |      WHERE d >= d0 AND d < d0 + 180
        |      GROUP BY o.cust, d0)
        |SELECT CAST(year(d0) AS VARCHAR) || '-Q' || CAST(quarter(d0) AS VARCHAR) AS cohort,
        |       CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(rev_c) // COUNT(*) AS BIGINT) AS ltv_c,
        |       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 10000
        |         // COUNT(*) AS BIGINT) AS repeat_e4
        |FROM w GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q356_cost_threshold" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c,
        |             o_orderstatus = 'F' AS y
        |           FROM orders),
        |bk AS (SELECT *, ntile(10) OVER (ORDER BY v_c, k) AS bk FROM o),
        |cuts AS (SELECT bk, MAX(v_c) AS cut_c FROM bk WHERE bk <= 9 GROUP BY bk),
        |costs AS (SELECT cuts.bk, cut_c,
        |            SUM(CASE WHEN v_c > cut_c AND NOT y THEN 1 ELSE 0 END) AS fp,
        |            SUM(CASE WHEN v_c <= cut_c AND y THEN 1 ELSE 0 END) AS fn
        |          FROM o CROSS JOIN cuts GROUP BY cuts.bk, cut_c),
        |best AS (SELECT cut_c AS best_cut FROM costs
        |         ORDER BY fp + 5 * fn, cut_c LIMIT 1)
        |SELECT CAST(bk AS BIGINT) AS decile, CAST(cut_c AS BIGINT) AS cut_c,
        |       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |       CAST(fp + 5 * fn AS BIGINT) AS cost,
        |       cut_c = best_cut AS is_best
        |FROM costs, best ORDER BY decile""".stripMargin
  )
}
