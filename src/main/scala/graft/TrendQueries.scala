package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trend / seasonality diagnostics (round 10, twenty-seventh wave):
  * Mann-Kendall trend test with exact tie-corrected variance, integer
  * Holt double-exponential smoothing as a per-key fold, seasonal-
  * strength variance decomposition, and trailing-z-score anomaly
  * episodes.
  *
  * Reference intent: the reference's only time-series machinery is the
  * per-store Prophet fit (services/training-service/app/
  * train_utils.py:24-35) — it never TESTS for trend, never separates
  * seasonal strength from noise, and has no anomaly surfacing. These
  * are the monitoring ops a forecasting platform runs on every series
  * before trusting a model to it. All series here are daily aggregates
  * per event type — CELL-table scale (|days|·|types| rows), so
  * pairwise/fold work is calendar-bounded while the corpus contributes
  * exactly one scan; across 10⁶ keys each shape stays embarrassingly
  * parallel (per-key windows/folds, no cross-key traffic).
  */
object TrendQueries {

  /** Truncate-toward-zero division, spelled identically in both
    * engines (Spark `div` and DuckDB `//` both truncate; the CASE
    * keeps that explicit for negative numerators). */
  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G228: Mann-Kendall trend test (exact, tie-corrected) ───────────
    // Is each event type's daily volume trending? S = Σ_{i<j}
    // sign(x_j − x_i) over the |days|² day pairs (cell-scale pairwise —
    // the corpus is reduced to daily counts first), tie-corrected
    // variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the
    // 95% decision 180000·S² > 38416·(18·Var) — i.e. z² > 1.96² with
    // every term exact BIGINT, no sqrt anywhere. The nonparametric
    // sibling of q154's OLS slope and q172's Theil-Sen.
    "q283_mann_kendall" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val l = daily.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
      val r = daily.select(col("event_type"), col("day").as("d2"), col("x").as("x2"))
      val sTab = l.join(r, Seq("event_type"))
        .filter(col("d1") < col("d2"))
        .groupBy("event_type")
        .agg(sum(signum(col("x2") - col("x1")).cast(LongType)).as("s"))
      val ties = daily.groupBy("event_type", "x").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
      val n = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      n.join(sTab, Seq("event_type")).join(ties, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("s"),
          expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term").as("var18"),
          expr("cast(case when s > 0 then 1 when s < 0 then -1 else 0 end as bigint)").as("direction"),
          expr("180000 * s * s > 38416 * (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)")
            .as("significant_95"))
        .orderBy("event_type")
    }),

    // ── G229: integer Holt smoothing (double exponential, per key) ─────
    // Level+trend smoothing with α=0.2, β=0.1 as an EXACT integer fold:
    // l' = (2x + 8(l+b)) div 10, b' = ((l'−l) + 9b) div 10 at e2 scale,
    // truncate-toward-zero spelled sign-explicitly in both engines.
    // The recurrence is inherently sequential IN TIME but the series
    // per key is calendar-bounded, so the fold is an aggregate() HOF
    // over the sorted daily array — per-key state, embarrassingly
    // parallel across keys (the flatMapGroups shape q31 uses, without
    // leaving Catalyst). DuckDB mirrors with list_reduce, whose
    // first-element seeding IS the l₀=x₀, b₀=0 init.
    "q284_holt_smoothing" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((count(lit(1)) * 100).as("x2"))
      val series = daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("x2")))).as("sd"))
        .select(col("event_type"),
          expr("transform(sd, e -> e.x2)").as("xs"))
      val lNum = "2 * x + 8 * (element_at(acc, 1) + element_at(acc, 2))"
      val bNum = s"((${sdiv(lNum, "10")}) - element_at(acc, 1)) + 9 * element_at(acc, 2)"
      series.select(col("event_type"),
          size(col("xs")).cast(LongType).as("n_days"),
          expr(
            s"""aggregate(slice(xs, 2, size(xs) - 1),
               |          array(element_at(xs, 1), cast(0 as bigint)),
               |          (acc, x) -> array(${sdiv(lNum, "10")}, ${sdiv(bNum, "10")}))""".stripMargin)
            .as("st"))
        .select(col("event_type"), col("n_days"),
          expr("element_at(st, 1)").as("level_e2"),
          expr("element_at(st, 2)").as("trend_e2"),
          expr("element_at(st, 1) + element_at(st, 2)").as("forecast_e2"))
        .orderBy("event_type")
    }),

    // ── G230: seasonal-strength decomposition (weekday ANOVA) ──────────
    // How much of each series' variance is weekly seasonality?
    // strength = 1 − SS_resid/SS_total with SS_w = (n_w·Σx²−(Σx)²)/n_w
    // floored at e4 per weekday cell (documented floor — both engines
    // compute the identical integer), then strength_e6 = 1e6 −
    // resid·1e6 div total. The decision feed for q180's seasonal
    // index: a series with strength ≈ 0 should NOT be deseasonalized.
    "q285_seasonal_strength" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("wd", dayofweek(col("day")).cast(LongType))
      val byWd = daily.groupBy("event_type", "wd")
        .agg(count(lit(1)).as("nw"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("ssw_e4", expr("(nw * sxx - sx * sx) * 10000 div nw"))
      val resid = byWd.groupBy("event_type")
        .agg(sum("ssw_e4").as("ss_resid_e4"))
      val total = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("ss_total_e4", expr("(n_days * sxx - sx * sx) * 10000 div n_days"))
        .select("event_type", "n_days", "ss_total_e4")
      total.join(resid, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("ss_total_e4"), col("ss_resid_e4"),
          expr("1000000 - ss_resid_e4 * 1000000 div greatest(ss_total_e4, 1)")
            .as("strength_e6"))
        .orderBy("event_type")
    }),

    // ── G231: trailing-z anomaly episodes (gaps-and-islands of alerts) ─
    // Alert days where today's volume exceeds the trailing-28-day
    // baseline by 2σ — z² kept exact by clearing denominators:
    // (n·x−Sx)² > 4·(n·Sxx−Sx²) with the trailing moments from a
    // PARTITIONED rows-frame window (never global), a ≥14-day warmup,
    // and consecutive alert days grouped into episodes by the q50
    // gaps-and-islands discipline. Emits per-episode span and peak
    // z²_e4 — the alert feed q137's changepoint day would escalate.
    "q286_anomaly_episodes" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy(col("day"))
        .rowsBetween(-28, -1)
      val scored = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum("x").over(w))
        .withColumn("sxx", sum(expr("x * x")).over(w))
        .filter(col("n") >= 14)
        .withColumn("den", expr("greatest(n * sxx - sx * sx, 1)"))
        .withColumn("z2_e4", expr("(n * x - sx) * (n * x - sx) * 10000 div den"))
        .withColumn("alert", expr("n * x > sx and (n * x - sx) * (n * x - sx) > 4 * den"))
      val alerts = scored.filter(col("alert"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("day")))
        .withColumn("island", expr("date_sub(day, rn)"))
      alerts.groupBy("event_type", "island")
        .agg(min("day").as("start_day"), max("day").as("end_day"),
          count(lit(1)).as("n_days"), max("z2_e4").as("peak_z2_e4"))
        .drop("island")
        .orderBy("event_type", "start_day")
    })
  )

  def oracleSql: Map[String, String] = {
    val sdivSql = (num: String, den: String) =>
      s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"
    // element el = [x, 0] (1-based list indexing), accumulator acc = [l, b]
    val lNumD = "2 * el[1] + 8 * (acc[1] + acc[2])"
    val bNumD = s"((${sdivSql(lNumD, "10")}) - acc[1]) + 9 * acc[2]"
    Map(

      "q283_mann_kendall" ->
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
          |               FROM events GROUP BY 1, 2),
          |s AS (SELECT l.event_type,
          |        SUM(CASE WHEN r.x > l.x THEN 1 WHEN r.x < l.x THEN -1 ELSE 0 END) AS s
          |      FROM daily l JOIN daily r
          |        ON l.event_type = r.event_type AND l.day < r.day
          |      GROUP BY l.event_type),
          |t AS (SELECT event_type, SUM(t*(t-1)*(2*t+5)) AS tie_term
          |      FROM (SELECT event_type, x, COUNT(*) AS t FROM daily GROUP BY 1, 2)
          |      GROUP BY event_type),
          |n AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1)
          |SELECT n.event_type, CAST(n_days AS BIGINT) AS n_days,
          |       CAST(s AS BIGINT) AS s,
          |       CAST(n_days*(n_days-1)*(2*n_days+5) - tie_term AS BIGINT) AS var18,
          |       CAST(CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END AS BIGINT) AS direction,
          |       180000*s*s > 38416*(n_days*(n_days-1)*(2*n_days+5) - tie_term) AS significant_95
          |FROM n JOIN s USING (event_type) JOIN t USING (event_type)
          |ORDER BY event_type""".stripMargin,

      "q284_holt_smoothing" ->
        s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |                 COUNT(*) * 100 AS x2
           |               FROM events GROUP BY 1, 2),
           |ser AS (SELECT event_type, list(x2 ORDER BY day) AS xs
           |        FROM daily GROUP BY event_type),
           |st AS (SELECT event_type, CAST(len(xs) AS BIGINT) AS n_days,
           |         list_reduce(
           |           [[xs[1], CAST(0 AS BIGINT)]] || list_transform(xs[2:], x -> [x, CAST(0 AS BIGINT)]),
           |           (acc, el) -> [${sdivSql(lNumD, "10")},
           |                         ${sdivSql(bNumD, "10")}]) AS f
           |       FROM ser)
           |SELECT event_type, n_days,
           |       CAST(f[1] AS BIGINT) AS level_e2,
           |       CAST(f[2] AS BIGINT) AS trend_e2,
           |       CAST(f[1] + f[2] AS BIGINT) AS forecast_e2
           |FROM st ORDER BY event_type""".stripMargin,

      "q285_seasonal_strength" ->
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
          |               FROM events GROUP BY 1, 2),
          |d2 AS (SELECT *, CAST(dayofweek(day) + 1 AS BIGINT) AS wd FROM daily),
          |byw AS (SELECT event_type, wd, COUNT(*) AS nw, SUM(x) AS sx, SUM(x*x) AS sxx
          |        FROM d2 GROUP BY 1, 2),
          |res AS (SELECT event_type,
          |          SUM((nw*sxx - sx*sx) * 10000 // nw) AS ss_resid_e4
          |        FROM byw GROUP BY event_type),
          |tot AS (SELECT event_type, COUNT(*) AS n_days,
          |          (COUNT(*)*SUM(x*x) - SUM(x)*SUM(x)) * 10000 // COUNT(*) AS ss_total_e4
          |        FROM daily GROUP BY event_type)
          |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
          |       CAST(ss_total_e4 AS BIGINT) AS ss_total_e4,
          |       CAST(ss_resid_e4 AS BIGINT) AS ss_resid_e4,
          |       CAST(1000000 - ss_resid_e4 * 1000000 // GREATEST(ss_total_e4, 1) AS BIGINT) AS strength_e6
          |FROM tot JOIN res USING (event_type)
          |ORDER BY event_type""".stripMargin,

      "q286_anomaly_episodes" ->
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
          |               FROM events GROUP BY 1, 2),
          |sc AS (SELECT *,
          |         COUNT(*)   OVER tw AS n,
          |         SUM(x)     OVER tw AS sx,
          |         SUM(x*x)   OVER tw AS sxx
          |       FROM daily
          |       WINDOW tw AS (PARTITION BY event_type ORDER BY day
          |                     ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
          |al AS (SELECT event_type, day,
          |         (n*x - sx)*(n*x - sx) * 10000 // GREATEST(n*sxx - sx*sx, 1) AS z2_e4
          |       FROM sc
          |       WHERE n >= 14 AND n*x > sx
          |         AND (n*x - sx)*(n*x - sx) > 4 * GREATEST(n*sxx - sx*sx, 1)),
          |isl AS (SELECT *, day - CAST(ROW_NUMBER() OVER
          |          (PARTITION BY event_type ORDER BY day) AS INT) AS island
          |        FROM al)
          |SELECT event_type, MIN(day) AS start_day, MAX(day) AS end_day,
          |       CAST(COUNT(*) AS BIGINT) AS n_days,
          |       CAST(MAX(z2_e4) AS BIGINT) AS peak_z2_e4
          |FROM isl GROUP BY event_type, island
          |ORDER BY event_type, start_day""".stripMargin
    )
  }
}
