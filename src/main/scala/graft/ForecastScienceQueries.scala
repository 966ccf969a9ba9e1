package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Forecast-science subsystem (round 10, thirty-eighth wave): the
  * evaluation machinery a production sales forecaster needs AROUND the
  * model — quantile (pinball) loss, hierarchical coherence, Croston's
  * method for intermittent demand, and the forecast-value-added audit
  * that decides whether a model beats the naive baselines at all.
  *
  * Reference intent: the reference trains per-store Prophet models
  * (services/training-service/app/train_utils.py:24-35) and reports
  * point metrics only (RMSE/MAPE via cross-validation,
  * train_utils.py:44-56; our q13/q30). A production forecast org also
  * needs (a) QUANTILE loss, because safety stock is priced off p90
  * demand, not the mean; (b) COHERENT forecasts across the
  * store→region hierarchy, or the regional plan won't sum to the store
  * plans; (c) a dedicated intermittent-demand path — Croston (1972) —
  * because most SKU×day series are mostly zeros and SES of the raw
  * series is biased right after each demand spike; (d) an FVA audit,
  * because a model that loses to "repeat last week" should be deleted.
  *
  * Scale shape shared by all four: ONE shuffle reduces the fact table
  * to (key × week) grain; everything after runs on the reduced series
  * (|keys| × |weeks| rows), spine-filled via a broadcast calendar so
  * zero-weeks are real observations. Windows are partitioned by key —
  * never corpus-global. The train/test cut is data-anchored (max week
  * minus 8 weeks), never wall clock. House integer discipline: cents
  * and e4 ratios, `div`/`//` on non-negative numerators only,
  * sign-explicit sdiv where deltas can go negative.
  */
object ForecastScienceQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** Weekly revenue series per key column, spine-filled (every key ×
    * every week in the global domain, zero-filled), with the train/test
    * cutoff attached: `is_test` = the last 8 calendar weeks ending at
    * the anchor (max week). One corpus shuffle (the groupBy); the spine
    * is |keys| × |weeks| — broadcast-scale. */
  private def weeklySeries(df: DataFrame, keyCol: String): DataFrame = {
    val wk = df
      .select(col(keyCol).as("k"), trunc(to_date(col("o_orderdate")), "week").as("week"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .groupBy("k", "week").agg(sum("cents").as("rev_c"))
    val dom = wk.agg(min("week").as("wmin"), max("week").as("wmax"))
    val weeks = dom.select(explode(expr("sequence(wmin, wmax, interval 7 day)")).as("week"),
      col("wmax"))
    val keys = wk.select("k").distinct()
    keys.crossJoin(broadcast(weeks))
      .join(wk, Seq("k", "week"), "left")
      .na.fill(0L, Seq("rev_c"))
      .withColumn("is_test", col("week") > date_sub(col("wmax"), 56))
      .drop("wmax")
  }

  /** DuckDB mirror of weeklySeries: one CTE string parameterized by the
    * key expression, reused verbatim by the three weekly oracles so
    * engine and oracle share every grain decision. */
  private def weeklySql(keyExpr: String, from: String) =
    s"""wk AS (SELECT $keyExpr AS k, date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
       |         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c
       |       FROM $from GROUP BY 1, 2),
       |dom AS (SELECT MIN(week) AS wmin, MAX(week) AS wmax FROM wk),
       |weeks AS (SELECT CAST(w AS DATE) AS week, wmax FROM
       |            (SELECT UNNEST(generate_series(wmin, wmax, INTERVAL 7 DAY)) AS w, wmax
       |             FROM dom) t),
       |ser AS (SELECT keys.k AS k, weeks.week, COALESCE(rev_c, 0) AS rev_c,
       |          weeks.week > wmax - 56 AS is_test
       |        FROM (SELECT DISTINCT k FROM wk) keys
       |        CROSS JOIN weeks
       |        LEFT JOIN wk ON wk.k = keys.k AND wk.week = weeks.week)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G270: pinball (quantile) loss audit ────────────────────────────
    // Per priority: nearest-rank q10/q50/q90 of the spine-filled TRAIN
    // weekly revenue is the quantile forecast; pinball loss
    // τ·(y−ŷ)⁺ + (1−τ)·(ŷ−y)⁺ is summed over the 8 TEST weeks at e1
    // (τ in tenths), so the whole loss is exact integer cents·e1 with
    // no division anywhere. Nearest-rank index = ceil(τ·n) — the
    // discrete convention q208 bridges. The p90 row is what prices
    // safety stock; the audit certifies p10 ≤ p50 ≤ p90 ordering and
    // that higher τ penalizes under-forecasting harder.
    "q325_pinball_loss" -> ((s, dir) => {
      val ser = weeklySeries(Tables.orders(s, dir), "o_orderpriority")
      val train = ser.filter(!col("is_test"))
      val w = Window.partitionBy("k").orderBy("rev_c", "week")
      val ranked = train.withColumn("rnk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("k")))
      val taus = ranked.crossJoin(
        broadcast(s.range(1, 10, 4).select((col("id")).as("tau_e1"))))
      val qf = taus.filter(col("rnk") === expr("(tau_e1 * n + 9) div 10"))
        .groupBy(col("k"), col("tau_e1"))
        .agg(min("rev_c").as("q_fc_c"), min("n").as("n_train_weeks"))
      val test = ser.filter(col("is_test"))
      test.join(broadcast(qf), Seq("k"))
        .groupBy(col("k").as("o_orderpriority"), col("tau_e1"))
        .agg(min("n_train_weeks").as("n_train_weeks"),
          count(lit(1)).as("n_test_weeks"), min("q_fc_c").as("q_fc_c"),
          sum(expr("""case when rev_c >= q_fc_c then tau_e1 * (rev_c - q_fc_c)
                     |     else (10 - tau_e1) * (q_fc_c - rev_c) end""".stripMargin))
            .as("pinball_e1"))
        .orderBy("o_orderpriority", "tau_e1")
    }),

    // ── G271: hierarchical forecast coherence (bottom-up vs direct) ────
    // Weekly revenue at nation grain and at region grain (customer →
    // nation → region); per-level forecast = floor(last-4-train-weeks
    // total / 4) cents. Because the forecast is linear in the series,
    // bottom-up (Σ nation forecasts within region) and direct (region
    // forecast) agree EXCEPT for the per-nation floor — the coherence
    // gap is provably bounded by the region's nation count, and the
    // audit emits both forecasts' absolute error against the realized
    // 8-week test total (8×fc vs actual). At 1e12 rows this is the MinT
    // decision input: gap ≈ 0 says bottom-up is safe; a model family
    // where the gap blows up needs explicit reconciliation.
    "q326_hier_coherence" -> ((s, dir) => {
      val geo = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      def level(keyCol: String) = {
        val ser = weeklySeries(geo, keyCol)
        val cut = ser.agg(max(when(!col("is_test"), col("week"))).as("wcut"))
        ser.crossJoin(broadcast(cut))
          .groupBy("k")
          .agg(sum(when(!col("is_test") && col("week") > date_sub(col("wcut"), 28),
              col("rev_c")).otherwise(0L)).as("last4_c"),
            sum(when(col("is_test"), col("rev_c")).otherwise(0L)).as("actual_c"))
          .withColumn("fc_c", expr("last4_c div 4"))
      }
      val nat = level("n_name")
        .join(broadcast(Tables.nation(s, dir)
            .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
            .select(col("n_name"), col("r_name"))),
          col("k") === col("n_name"))
        .groupBy("r_name")
        .agg(sum("fc_c").as("bottom_up_fc_c"), count(lit(1)).as("n_nations"))
      val reg = level("r_name")
        .select(col("k").as("r_name"), col("fc_c").as("direct_fc_c"), col("actual_c"))
      reg.join(nat, Seq("r_name"))
        .select(col("r_name"), col("direct_fc_c"), col("bottom_up_fc_c"),
          (col("direct_fc_c") - col("bottom_up_fc_c")).as("coherence_gap_c"),
          col("n_nations"), col("actual_c"),
          abs(col("direct_fc_c") * 8 - col("actual_c")).as("err_direct_c"),
          abs(col("bottom_up_fc_c") * 8 - col("actual_c")).as("err_bottom_up_c"))
        .orderBy("r_name")
    }),

    // ── G272: Croston's method (intermittent demand) ───────────────────
    // Per-part demand events (l_shipdate days with non-zero quantity):
    // Croston smooths the demand SIZE z and the inter-demand INTERVAL p
    // separately with α = 1/5, updating ONLY on demand days — the fix
    // for SES's bias on mostly-zero series. The recurrence is a
    // per-key aggregate() fold over the sorted event array (state
    // [z_e4, p_e4, prev_day]; p seeds on the SECOND event with the raw
    // first interval), embarrassingly parallel across parts — the
    // corpus-scale work is one groupBy. Demand rate = z/p at e4.
    // Output is bounded to the md5(partkey)%29==0 pick (~3%); the
    // pick is a deterministic key predicate, so Catalyst pushes it
    // below the fold and the groupBy to the scan — at scale you'd
    // drop it and land all parts' rates (per-key parallel, linear).
    "q327_croston" -> ((s, dir) => {
      val ev = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01")).cast(LongType).as("day"),
          expr("cast(round(l_quantity) as bigint)").as("q"))
        .groupBy("l_partkey", "day").agg(sum("q").as("qd"))
      val zUp = s"element_at(acc, 1) + ${sdiv("e.qd * 10000 - element_at(acc, 1)", "5")}"
      val iRaw = "(e.day - element_at(acc, 3)) * 10000"
      val pUp = s"""case when element_at(acc, 2) = 0 then $iRaw
                   |     else element_at(acc, 2) + ${sdiv(s"$iRaw - element_at(acc, 2)", "5")} end""".stripMargin
      ev.groupBy("l_partkey")
        .agg(array_sort(collect_list(struct(col("day"), col("qd")))).as("evs"))
        .filter(size(col("evs")) >= 2)
        .select(col("l_partkey"), size(col("evs")).cast(LongType).as("n_demand_days"),
          expr(
            s"""aggregate(slice(evs, 2, size(evs) - 1),
               |          array(element_at(evs, 1).qd * 10000, cast(0 as bigint),
               |                element_at(evs, 1).day),
               |          (acc, e) -> array($zUp, $pUp, e.day))""".stripMargin).as("st"))
        .filter(expr("cast(conv(substring(md5(cast(l_partkey as string)), 1, 6), 16, 10) as bigint) % 29 = 0"))
        .select(col("l_partkey"), col("n_demand_days"),
          expr("element_at(st, 1)").as("z_e4"),
          expr("element_at(st, 2)").as("p_e4"),
          expr("element_at(st, 1) * 10000 div greatest(element_at(st, 2), 1)").as("rate_e4"))
        .orderBy("l_partkey")
    }),

    // ── G273: forecast value-added (beat-the-naive audit) ──────────────
    // Per priority, three frozen-at-cutoff baselines forecast every
    // test week: naive (last train week), ma4, ma13 (floored means of
    // the trailing train window). MAE over the 8 test weeks, and
    // FVA_e4 = (mae_naive − mae_m) / mae_naive — the share of naive
    // error a method removes (negative = the "model" is worse than
    // repeating last week, the deletion criterion). Every forecast is
    // a per-key scalar, so the test join is broadcast-scale; methods
    // are rows (long format) so adding a model never changes schema.
    "q328_forecast_fva" -> ((s, dir) => {
      val ser = weeklySeries(Tables.orders(s, dir), "o_orderpriority")
      val cut = ser.agg(max(when(!col("is_test"), col("week"))).as("wcut"))
      val fc = ser.crossJoin(broadcast(cut)).filter(!col("is_test"))
        .groupBy("k")
        .agg(max_by(col("rev_c"), col("week")).as("fc_naive"),
          expr("sum(case when week > date_sub(wcut, 28) then rev_c else 0L end) div 4")
            .as("fc_ma4"),
          expr("sum(case when week > date_sub(wcut, 91) then rev_c else 0L end) div 13")
            .as("fc_ma13"))
      val m = ser.filter(col("is_test")).join(broadcast(fc), Seq("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_test_weeks"),
          expr("sum(abs(rev_c - fc_naive))").as("ae_naive"),
          expr("sum(abs(rev_c - fc_ma4))").as("ae_ma4"),
          expr("sum(abs(rev_c - fc_ma13))").as("ae_ma13"))
        .select(col("k"), col("n_test_weeks"),
          expr("ae_naive div n_test_weeks").as("mae_naive_c"),
          expr("ae_ma4 div n_test_weeks").as("mae_ma4_c"),
          expr("ae_ma13 div n_test_weeks").as("mae_ma13_c"))
      m.select(col("k").as("o_orderpriority"), col("n_test_weeks"),
          explode(array(
            struct(lit("naive").as("method"), col("mae_naive_c").as("mae_c")),
            struct(lit("ma4").as("method"), col("mae_ma4_c").as("mae_c")),
            struct(lit("ma13").as("method"), col("mae_ma13_c").as("mae_c")))).as("e"),
          col("mae_naive_c"))
        .select(col("o_orderpriority"), col("n_test_weeks"),
          col("e.method").as("method"), col("e.mae_c").as("mae_c"),
          expr(sdiv("(mae_naive_c - e.mae_c) * 10000", "greatest(mae_naive_c, 1)"))
            .as("fva_e4"))
        .orderBy("o_orderpriority", "method")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q325_pinball_loss" ->
      s"""WITH ${weeklySql("o_orderpriority", "orders")},
         |train AS (SELECT k, week, rev_c,
         |            ROW_NUMBER() OVER (PARTITION BY k ORDER BY rev_c, week) AS rnk,
         |            COUNT(*) OVER (PARTITION BY k) AS n
         |          FROM ser WHERE NOT is_test),
         |qf AS (SELECT k, tau_e1, MIN(rev_c) AS q_fc_c, MIN(n) AS n_train_weeks
         |       FROM train CROSS JOIN (SELECT UNNEST([1, 5, 9]) AS tau_e1) taus
         |       WHERE rnk = (tau_e1 * n + 9) // 10
         |       GROUP BY 1, 2)
         |SELECT ser.k AS o_orderpriority, CAST(tau_e1 AS BIGINT) AS tau_e1,
         |       n_train_weeks, CAST(COUNT(*) AS BIGINT) AS n_test_weeks, q_fc_c,
         |       CAST(SUM(CASE WHEN rev_c >= q_fc_c THEN tau_e1 * (rev_c - q_fc_c)
         |                ELSE (10 - tau_e1) * (q_fc_c - rev_c) END) AS BIGINT) AS pinball_e1
         |FROM ser JOIN qf ON qf.k = ser.k
         |WHERE is_test
         |GROUP BY 1, 2, 3, 5
         |ORDER BY o_orderpriority, tau_e1""".stripMargin,

    "q326_hier_coherence" -> {
      def levelSql(keyExpr: String) =
        s"""WITH ${weeklySql(keyExpr,
          """orders JOIN customer ON o_custkey = c_custkey
            |        JOIN nation ON c_nationkey = n_nationkey
            |        JOIN region ON n_regionkey = r_regionkey""".stripMargin)},
           |cut AS (SELECT MAX(CASE WHEN NOT is_test THEN week END) AS wcut FROM ser)
           |SELECT k,
           |  CAST(SUM(CASE WHEN NOT is_test AND week > wcut - 28 THEN rev_c ELSE 0 END) // 4 AS BIGINT) AS fc_c,
           |  CAST(SUM(CASE WHEN is_test THEN rev_c ELSE 0 END) AS BIGINT) AS actual_c
           |FROM ser, cut GROUP BY k""".stripMargin
      s"""WITH nat AS (${levelSql("n_name")}),
         |reg AS (${levelSql("r_name")}),
         |bu AS (SELECT r_name, CAST(SUM(fc_c) AS BIGINT) AS bottom_up_fc_c,
         |         CAST(COUNT(*) AS BIGINT) AS n_nations
         |       FROM nat JOIN nation ON nat.k = nation.n_name
         |                JOIN region ON nation.n_regionkey = region.r_regionkey
         |       GROUP BY r_name)
         |SELECT reg.k AS r_name, reg.fc_c AS direct_fc_c, bottom_up_fc_c,
         |       reg.fc_c - bottom_up_fc_c AS coherence_gap_c, n_nations,
         |       reg.actual_c AS actual_c,
         |       ABS(reg.fc_c * 8 - reg.actual_c) AS err_direct_c,
         |       ABS(bottom_up_fc_c * 8 - reg.actual_c) AS err_bottom_up_c
         |FROM reg JOIN bu ON bu.r_name = reg.k
         |ORDER BY r_name""".stripMargin
    },

    "q327_croston" -> {
      val zUpD = s"acc[1] + ${sdivSql("el[2] * 10000 - acc[1]", "5")}"
      val iRawD = "(el[1] - acc[3]) * 10000"
      val pUpD = s"""CASE WHEN acc[2] = 0 THEN $iRawD
                    |     ELSE acc[2] + ${sdivSql(s"$iRawD - acc[2]", "5")} END""".stripMargin
      s"""WITH ev AS (SELECT l_partkey,
         |              CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS day,
         |              SUM(CAST(round(l_quantity) AS BIGINT)) AS qd
         |            FROM lineitem GROUP BY 1, 2),
         |ser AS (SELECT l_partkey, COUNT(*) AS n,
         |          list([day, qd] ORDER BY day) AS evs
         |        FROM ev GROUP BY l_partkey HAVING COUNT(*) >= 2),
         |st AS (SELECT l_partkey, CAST(n AS BIGINT) AS n_demand_days,
         |         list_reduce(
         |           [[evs[1][2] * 10000, CAST(0 AS BIGINT), evs[1][1]]] ||
         |             list_transform(evs[2:], el -> [el[1], el[2], CAST(0 AS BIGINT)]),
         |           (acc, el) -> [$zUpD, $pUpD, el[1]]) AS f
         |       FROM ser
         |       WHERE CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 6) AS BIGINT) % 29 = 0)
         |SELECT l_partkey, n_demand_days,
         |       CAST(f[1] AS BIGINT) AS z_e4, CAST(f[2] AS BIGINT) AS p_e4,
         |       CAST(f[1] * 10000 // GREATEST(f[2], 1) AS BIGINT) AS rate_e4
         |FROM st ORDER BY l_partkey""".stripMargin
    },

    "q328_forecast_fva" ->
      s"""WITH ${weeklySql("o_orderpriority", "orders")},
         |cut AS (SELECT MAX(CASE WHEN NOT is_test THEN week END) AS wcut FROM ser),
         |fc AS (SELECT k,
         |         arg_max(rev_c, week) FILTER (WHERE NOT is_test) AS fc_naive,
         |         CAST(SUM(CASE WHEN NOT is_test AND week > wcut - 28 THEN rev_c ELSE 0 END) // 4 AS BIGINT) AS fc_ma4,
         |         CAST(SUM(CASE WHEN NOT is_test AND week > wcut - 91 THEN rev_c ELSE 0 END) // 13 AS BIGINT) AS fc_ma13
         |       FROM ser, cut GROUP BY k),
         |m AS (SELECT ser.k, CAST(COUNT(*) AS BIGINT) AS n_test_weeks,
         |        CAST(SUM(ABS(rev_c - fc_naive)) // COUNT(*) AS BIGINT) AS mae_naive_c,
         |        CAST(SUM(ABS(rev_c - fc_ma4)) // COUNT(*) AS BIGINT) AS mae_ma4_c,
         |        CAST(SUM(ABS(rev_c - fc_ma13)) // COUNT(*) AS BIGINT) AS mae_ma13_c
         |      FROM ser JOIN fc ON fc.k = ser.k WHERE is_test GROUP BY ser.k),
         |lng AS (SELECT k, n_test_weeks, 'naive' AS method, mae_naive_c AS mae_c,
         |          mae_naive_c FROM m
         |        UNION ALL SELECT k, n_test_weeks, 'ma4', mae_ma4_c, mae_naive_c FROM m
         |        UNION ALL SELECT k, n_test_weeks, 'ma13', mae_ma13_c, mae_naive_c FROM m)
         |SELECT k AS o_orderpriority, n_test_weeks, method, mae_c,
         |       CAST(${sdivSql("(mae_naive_c - mae_c) * 10000", "GREATEST(mae_naive_c, 1)")} AS BIGINT) AS fva_e4
         |FROM lng ORDER BY o_orderpriority, method""".stripMargin
  )
}
