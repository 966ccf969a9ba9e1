package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series-decomposition and pricing subsystem (round 10,
  * forty-sixth wave): STL-lite trend/seasonal/remainder decomposition
  * with Wang–Hyndman strength scores, an inverse-MAE forecast ensemble,
  * the rolling-origin backtest matrix, and an arc-elasticity pricing
  * screen.
  *
  * Reference intent: the reference trusts Prophet's internal
  * trend+seasonality split (services/training-service/app/train_utils
  * .py:24-35) and never inspects it. These four make the decomposition
  * itself data: STL-lite shows WHERE the signal lives (strength scores
  * decide whether q31's weekly-seasonal OLS is even the right model
  * family), the ensemble prices combining forecasters instead of
  * picking one, the backtest matrix is the origin×horizon error grid
  * any honest forecast evaluation publishes, and the elasticity screen
  * reads the demand curve the forecast rides on. Exact integers
  * everywhere; day-grain series work rides band equi-joins on day
  * numbers — no unpartitioned windows.
  */
object TimePriceQueries {

  /** Daily corpus revenue in cents with integer day numbers — the
    * one-shuffle reduce every series query here starts from. */
  private def dailyRev(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))

  /** Dense zero-filled spine over [[dailyRev]]: a day with no orders IS
    * a zero-revenue observation, and the lag/MA machinery needs every
    * day present (sparse small-sf corpora would otherwise lose lag
    * joins and whole weekdays). Calendar-bounded explode — never
    * corpus-shaped. */
  private def denseDaily(s: SparkSession, dir: String): DataFrame = {
    val raw = dailyRev(s, dir)
    raw.agg(min("dn").as("lo"), max("dn").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("dn"))
      .join(raw, Seq("dn"), "left")
      .select(col("dn"), coalesce(col("y"), lit(0L)).as("y"))
  }

  private val DailyCte =
    """daily0 AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
      |            SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      |          FROM orders GROUP BY 1),
      |span AS (SELECT MIN(dn) AS lo, MAX(dn) AS hi FROM daily0),
      |dense AS (SELECT UNNEST(generate_series(lo, hi)) AS dn FROM span),
      |daily AS (SELECT dense.dn, COALESCE(daily0.y, 0) AS y
      |          FROM dense LEFT JOIN daily0 ON dense.dn = daily0.dn)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G302: STL-lite decomposition + strength scores ─────────────────
    // Trend = centered 7-day moving average (band equi-join |dn−dn'| ≤ 3
    // on the day-grain cells — never a window); weekday seasonal = mean
    // detrended value per day-of-week, re-centered; remainder = y − T − S.
    // Strengths (Wang–Hyndman): Fₜ = 1 − Var(R)/Var(T+R),
    // Fₛ = 1 − Var(R)/Var(S+R), both e4-floored from n-scaled exact
    // integer variances, clamped at 0. Interior days only (full 7-day
    // MA support) — edge days would dilute T with a shorter mean.
    // Output: the 7-row seasonal profile with the global strengths.
    "q357_stl_strength" -> ((s, dir) => {
      // dense day spine with zero-fill: a day with no orders IS a
      // zero-revenue observation, and the 7-day MA needs full support
      // on every interior day (sparse corpora would otherwise lose
      // whole weekdays from the seasonal profile)
      val d = denseDaily(s, dir)
      val trend = d.as("a")
        .join(d.as("b"), expr("b.dn between a.dn - 3 and a.dn + 3"))
        .groupBy(col("a.dn").as("dn"), col("a.y").as("y"))
        .agg(count(lit(1)).as("w"), sum(col("b.y")).as("sy"))
        .filter(col("w") === 7)
        .withColumn("t", expr("sy div 7"))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
        .withColumn("det", expr("y - t"))
      val seas0 = trend.groupBy("dow").agg(expr("sum(det) div count(1)").as("s0"))
      val center = seas0.agg(expr("sum(s0) div 7").as("c0"))
      val seas = seas0.crossJoin(broadcast(center)).withColumn("s", expr("s0 - c0"))
        .select("dow", "s")
      val full = trend.join(broadcast(seas), Seq("dow"))
        .withColumn("r", expr("det - s"))
      // squares of daily cents reach ~1e18 and their sums pass BIGINT —
      // the square terms accumulate in DECIMAL(38,0) (HUGEINT mirror)
      val mom = full.agg(count(lit(1)).as("n"),
          sum("r").as("sr"), sum(expr("cast(r as decimal(38,0)) * r")).as("srr"),
          sum(expr("t + r")).as("str"),
          sum(expr("cast(t + r as decimal(38,0)) * (t + r)")).as("strr"),
          sum(expr("s + r")).as("ssr"),
          sum(expr("cast(s + r as decimal(38,0)) * (s + r)")).as("ssrr"))
        // n-scaled variances at cents²: DECIMAL(38,0) (HUGEINT mirror)
        .withColumn("vr", expr("cast(n as decimal(38,0)) * srr - cast(sr as decimal(38,0)) * sr"))
        .withColumn("vtr", expr("cast(n as decimal(38,0)) * strr - cast(str as decimal(38,0)) * str"))
        .withColumn("vsr", expr("cast(n as decimal(38,0)) * ssrr - cast(ssr as decimal(38,0)) * ssr"))
        .withColumn("ft_e4", expr(
          "greatest(cast(10000 - vr * 10000 div greatest(vtr, 1) as bigint), 0L)"))
        .withColumn("fs_e4", expr(
          "greatest(cast(10000 - vr * 10000 div greatest(vsr, 1) as bigint), 0L)"))
        .select("n", "ft_e4", "fs_e4")
      seas.crossJoin(broadcast(mom))
        .select(col("dow").cast(LongType).as("dow"), col("s").as("seasonal_c"),
          col("n").as("n_days"), col("ft_e4"), col("fs_e4"))
        .orderBy("dow")
    }),

    // ── G303: inverse-MAE forecast ensemble ────────────────────────────
    // Three deterministic forecasters for daily revenue — naive (y at
    // d−1), snaive (y at d−7), trailing-28 mean — weighted by inverse
    // validation MAE normalized against the best member (w = min-MAE·10⁴
    // div MAE + 1 — precision weighting, scale-free in y's unit so
    // cents-scale MAEs can't floor it out). Validation = the 14
    // days before the test block, test = the final 14 days, both
    // data-anchored on the series end. Every lag is an equi-join on day
    // number (zero windows); the combined forecast is the
    // weight-floored mean, pinned per-row inside [min fᵢ, max fᵢ] by
    // the spec. Output: per-method validation MAE, weight, and test
    // MAE, plus the combined row.
    "q358_forecast_ensemble" -> ((s, dir) => {
      val d = denseDaily(s, dir)
      val last = d.agg(max("dn").as("dmax"))
      val base = d.crossJoin(broadcast(last))
        .withColumn("phase", expr(
          "case when dn > dmax - 14 then 'test' when dn > dmax - 28 then 'val' else 'fit' end"))
      val f1 = d.select(col("dn").as("j1"), col("y").as("f_naive"))
      val f7 = d.select(col("dn").as("j7"), col("y").as("f_snaive"))
      val ma = d.as("a").join(d.as("b"), expr("b.dn between a.dn - 28 and a.dn - 1"))
        .groupBy(col("a.dn").as("jm"))
        .agg(expr("sum(b.y) div count(1)").as("f_ma"))
      val scored = base.filter(col("phase") =!= "fit")
        .join(f1, expr("dn - 1 = j1"))
        .join(f7, expr("dn - 7 = j7"))
        .join(ma, expr("dn = jm"))
      val maes = scored.filter(col("phase") === "val")
        .agg(expr("sum(abs(y - f_naive)) div count(1)").as("mae_naive"),
          expr("sum(abs(y - f_snaive)) div count(1)").as("mae_snaive"),
          expr("sum(abs(y - f_ma)) div count(1)").as("mae_ma"))
        // weights normalized against the BEST member, not an absolute
        // reciprocal: cents-scale MAEs are ~1e8+, so a fixed 10⁶/MAE
        // would floor every weight to 0 (it did, at sf0.01 — the ANSI
        // divide-by-zero caught it). w = min·10⁴ div mae + 1 ∈ [1, 10001]
        // is scale-free and keeps w·f far from BIGINT range.
        .withColumn("mn", expr("least(mae_naive, mae_snaive, mae_ma)"))
        .withColumn("w_naive", expr("mn * 10000 div greatest(mae_naive, 1) + 1"))
        .withColumn("w_snaive", expr("mn * 10000 div greatest(mae_snaive, 1) + 1"))
        .withColumn("w_ma", expr("mn * 10000 div greatest(mae_ma, 1) + 1"))
      val test = scored.filter(col("phase") === "test")
        .crossJoin(broadcast(maes))
        .withColumn("f_comb", expr(
          "(w_naive * f_naive + w_snaive * f_snaive + w_ma * f_ma) div (w_naive + w_snaive + w_ma)"))
      test.agg(count(lit(1)).as("n_test"),
          max("w_naive").as("w_naive"), max("w_snaive").as("w_snaive"),
          max("w_ma").as("w_ma"),
          expr("sum(abs(y - f_naive)) div count(1)").as("test_mae_naive"),
          expr("sum(abs(y - f_snaive)) div count(1)").as("test_mae_snaive"),
          expr("sum(abs(y - f_ma)) div count(1)").as("test_mae_ma"),
          expr("sum(abs(y - f_comb)) div count(1)").as("test_mae_comb"),
          sum(when(col("f_comb") < least(col("f_naive"), col("f_snaive"), col("f_ma")) ||
            col("f_comb") > greatest(col("f_naive"), col("f_snaive"), col("f_ma")), 1L)
            .otherwise(0L)).as("n_outside_hull"))
    }),

    // ── G304: rolling-origin backtest matrix ───────────────────────────
    // The origin×horizon×method error grid: origins at series end − 8/6/4
    // weeks, horizons 1–2 weeks ahead, methods OLS-on-weekly-history vs
    // naive last-week. Weekly grain (one corpus reduce); each cell's
    // fit is the exact closed-form integer OLS over weeks < origin —
    // per-origin aggregates over the tiny week table, never re-scanning
    // the corpus. Absolute percentage errors e4, floor-div. The matrix
    // is what "our model beats naive" must show: EVERY origin, not one
    // lucky split.
    "q359_backtest_matrix" -> ((s, dir) => {
      // RANK space, not raw week numbers: sparse corpora can skip
      // calendar weeks near the tail, and an origin grid on raw week
      // ids would silently lose cells to the inner actual-join. The
      // rank is a triangular count on the PRE-AGGREGATED week table
      // (≤ |weeks|² cells, never corpus work) — dense by construction,
      // so every origin+horizon cell has an actual.
      val weekly0 = Tables.orders(s, dir)
        .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01') div 7").as("w"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val weekly = weekly0.as("a")
        .join(weekly0.select(col("w").as("w2")).as("b"), expr("b.w2 <= a.w"))
        .groupBy(col("a.w").as("w"), col("a.y").as("y"))
        .agg(count(lit(1)).as("rk"))
      val wmax = weekly.agg(max("rk").as("wm"))
      val origins = s.range(0, 3).select(
        expr("element_at(array(8L, 6L, 4L), cast(id + 1 as int))").as("back"))
        .crossJoin(broadcast(wmax))
        .select(expr("wm - back").as("o"))
      val horizons = s.range(1, 3).select(col("id").as("h"))
      val grid = origins.crossJoin(horizons)
      // per-origin OLS over ranks < o (week table × 3 origins — tiny)
      val fits = weekly.crossJoin(broadcast(origins))
        .filter(col("rk") < col("o"))
        .groupBy("o")
        .agg(count(lit(1)).as("nw"), sum("rk").as("sx"), sum("y").as("sy"),
          sum(expr("rk * y")).as("sxy"), sum(expr("rk * rk")).as("sxx"))
        // nw·sxy and sy·10⁶ cross 1e18 at sf1 — stage through DECIMAL(38,0)
        .withColumn("b_e6", expr(
          "cast((cast(nw as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy) * 1000000" +
            " div (cast(nw as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx) as bigint)"))
        .withColumn("a_e6", expr(
          "cast((cast(sy as decimal(38,0)) * 1000000 - cast(b_e6 as decimal(38,0)) * sx) div nw as bigint)"))
      val naive = weekly.crossJoin(broadcast(origins))
        .filter(col("rk") === col("o") - 1)
        .select(col("o"), col("y").as("f_naive"))
      grid.join(fits, Seq("o")).join(naive, Seq("o"))
        .join(weekly.select(col("rk").as("ark"), col("y").as("actual")),
          expr("ark = o + h - 1"))
        .withColumn("f_ols", expr("(a_e6 + b_e6 * ark) div 1000000"))
        .withColumn("ape_ols_e4", expr("abs(actual - f_ols) * 10000 div actual"))
        .withColumn("ape_naive_e4", expr("abs(actual - f_naive) * 10000 div actual"))
        .select(col("o"), col("h"), col("actual"), col("f_ols"), col("f_naive"),
          col("ape_ols_e4"), col("ape_naive_e4"))
        .orderBy("o", "h")
    }),

    // ── G305: arc-elasticity pricing screen ────────────────────────────
    // Per part, lineitems split at the part's median realized unit
    // price (discount variation IS the price experiment); arc
    // elasticity = ((Q₂−Q₁)·(P₁+P₂)) e4 div ((P₂−P₁)·(Q₁+Q₂)) between
    // the low/high halves. Unit price in exact milli-cents:
    // round(extprice·(1−disc)·1000) — ONE mirrored IEEE product before
    // the round (q274's one-float-op precedent) — div quantity. Brand
    // census: share of parts with negative elasticity (the demand-law
    // check) + nearest-rank median elasticity per brand, all
    // partitioned windows at part grain.
    "q360_price_elasticity" -> ((s, dir) => {
      // localCheckpoint: the unit-price rows feed the per-part median
      // window AND the halves join — lazily the scan+projection ran twice
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("p"), expr("cast(l_quantity as bigint)").as("q"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 1000) as bigint) div cast(l_quantity as bigint)")
            .as("up"))
        .localCheckpoint()
      val med = li
        .withColumn("rk", row_number().over(Window.partitionBy("p").orderBy(col("up").asc, col("q").asc)))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("p")))
        .filter(col("rk") === expr("(nn + 1) div 2"))
        .select(col("p"), col("up").as("med_up"))
      val halves = li.join(med, Seq("p"))
        .withColumn("hi", col("up") > col("med_up"))
        .groupBy("p")
        .agg(sum(when(!col("hi"), col("q")).otherwise(0L)).as("q1"),
          sum(when(col("hi"), col("q")).otherwise(0L)).as("q2"),
          sum(when(!col("hi"), col("up") * col("q")).otherwise(0L)).as("pw1"),
          sum(when(col("hi"), col("up") * col("q")).otherwise(0L)).as("pw2"))
        .filter(col("q1") > 0 && col("q2") > 0)
        .withColumn("p1", expr("pw1 div q1"))
        .withColumn("p2", expr("pw2 div q2"))
        .filter(col("p2") > col("p1"))
        .withColumn("els_e4", expr(
          "(q2 - q1) * (p1 + p2) * 10000 div ((p2 - p1) * (q1 + q2))"))
      val branded = halves.join(
        broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("p") === col("p_partkey"))
      val medEls = branded
        .withColumn("rk", row_number().over(
          Window.partitionBy("p_brand").orderBy(col("els_e4").asc, col("p").asc)))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("p_brand")))
        .filter(col("rk") === expr("(nn + 1) div 2"))
        .select(col("p_brand"), col("els_e4").as("median_els_e4"))
      branded.groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(when(col("els_e4") < 0, 1L).otherwise(0L)).as("n_negative"))
        .join(medEls, Seq("p_brand"))
        .withColumn("neg_share_e4", expr("n_negative * 10000 div n_parts"))
        .select("p_brand", "n_parts", "n_negative", "neg_share_e4", "median_els_e4")
        .orderBy("p_brand")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q357_stl_strength" ->
      s"""WITH $DailyCte,
        |tr AS (SELECT a.dn, a.y, COUNT(*) AS w, SUM(b.y) AS sy
        |       FROM daily a JOIN daily b ON b.dn BETWEEN a.dn - 3 AND a.dn + 3
        |       GROUP BY a.dn, a.y),
        |t2 AS (SELECT dn, y, sy // 7 AS t, ((dn % 7) + 7) % 7 AS dow,
        |         y - sy // 7 AS det
        |       FROM tr WHERE w = 7),
        |s0 AS (SELECT dow, SUM(det) // COUNT(*) AS s0 FROM t2 GROUP BY dow),
        |ctr AS (SELECT SUM(s0) // 7 AS c0 FROM s0),
        |seas AS (SELECT dow, s0 - c0 AS s FROM s0, ctr),
        |fl AS (SELECT t2.*, seas.s, det - s AS r FROM t2 JOIN seas USING (dow)),
        |mom AS (SELECT COUNT(*) AS n, SUM(r) AS sr, SUM(CAST(r AS HUGEINT) * r) AS srr,
        |          SUM(t + r) AS str, SUM(CAST(t + r AS HUGEINT) * (t + r)) AS strr,
        |          SUM(s + r) AS ssr, SUM(CAST(s + r AS HUGEINT) * (s + r)) AS ssrr
        |        FROM fl),
        |st AS (SELECT n,
        |         GREATEST(CAST(10000 - (CAST(n AS HUGEINT) * srr - CAST(sr AS HUGEINT) * sr) * 10000
        |           // GREATEST(CAST(n AS HUGEINT) * strr - CAST(str AS HUGEINT) * str, 1) AS BIGINT), 0) AS ft_e4,
        |         GREATEST(CAST(10000 - (CAST(n AS HUGEINT) * srr - CAST(sr AS HUGEINT) * sr) * 10000
        |           // GREATEST(CAST(n AS HUGEINT) * ssrr - CAST(ssr AS HUGEINT) * ssr, 1) AS BIGINT), 0) AS fs_e4
        |       FROM mom)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(s AS BIGINT) AS seasonal_c,
        |       CAST(n AS BIGINT) AS n_days,
        |       CAST(ft_e4 AS BIGINT) AS ft_e4, CAST(fs_e4 AS BIGINT) AS fs_e4
        |FROM seas, st ORDER BY dow""".stripMargin,

    "q358_forecast_ensemble" ->
      s"""WITH $DailyCte,
        |last AS (SELECT MAX(dn) AS dmax FROM daily),
        |base AS (SELECT dn, y,
        |           CASE WHEN dn > dmax - 14 THEN 'test'
        |                WHEN dn > dmax - 28 THEN 'val' ELSE 'fit' END AS phase
        |         FROM daily, last),
        |ma AS (SELECT a.dn AS jm, SUM(b.y) // COUNT(*) AS f_ma
        |       FROM daily a JOIN daily b ON b.dn BETWEEN a.dn - 28 AND a.dn - 1
        |       GROUP BY a.dn),
        |scored AS (SELECT base.dn, base.y, base.phase,
        |             f1.y AS f_naive, f7.y AS f_snaive, ma.f_ma
        |           FROM base
        |             JOIN daily f1 ON base.dn - 1 = f1.dn
        |             JOIN daily f7 ON base.dn - 7 = f7.dn
        |             JOIN ma ON base.dn = ma.jm
        |           WHERE base.phase != 'fit'),
        |maes AS (SELECT SUM(ABS(y - f_naive)) // COUNT(*) AS mae_naive,
        |           SUM(ABS(y - f_snaive)) // COUNT(*) AS mae_snaive,
        |           SUM(ABS(y - f_ma)) // COUNT(*) AS mae_ma
        |         FROM scored WHERE phase = 'val'),
        |ws AS (SELECT mn * 10000 // GREATEST(mae_naive, 1) + 1 AS w_naive,
        |         mn * 10000 // GREATEST(mae_snaive, 1) + 1 AS w_snaive,
        |         mn * 10000 // GREATEST(mae_ma, 1) + 1 AS w_ma
        |       FROM (SELECT *, LEAST(mae_naive, mae_snaive, mae_ma) AS mn FROM maes) z),
        |t AS (SELECT scored.*, ws.*,
        |        (w_naive * f_naive + w_snaive * f_snaive + w_ma * f_ma)
        |          // (w_naive + w_snaive + w_ma) AS f_comb
        |      FROM scored, ws WHERE phase = 'test')
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
        |       CAST(MAX(w_naive) AS BIGINT) AS w_naive,
        |       CAST(MAX(w_snaive) AS BIGINT) AS w_snaive,
        |       CAST(MAX(w_ma) AS BIGINT) AS w_ma,
        |       CAST(SUM(ABS(y - f_naive)) // COUNT(*) AS BIGINT) AS test_mae_naive,
        |       CAST(SUM(ABS(y - f_snaive)) // COUNT(*) AS BIGINT) AS test_mae_snaive,
        |       CAST(SUM(ABS(y - f_ma)) // COUNT(*) AS BIGINT) AS test_mae_ma,
        |       CAST(SUM(ABS(y - f_comb)) // COUNT(*) AS BIGINT) AS test_mae_comb,
        |       CAST(SUM(CASE WHEN f_comb < LEAST(f_naive, f_snaive, f_ma)
        |                      OR f_comb > GREATEST(f_naive, f_snaive, f_ma)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outside_hull
        |FROM t""".stripMargin,

    "q359_backtest_matrix" ->
      """WITH weekly0 AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS w,
        |                  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        |                FROM orders GROUP BY 1),
        |weekly AS (SELECT a.w, a.y, CAST(COUNT(*) AS BIGINT) AS rk
        |           FROM weekly0 a JOIN weekly0 b ON b.w <= a.w
        |           GROUP BY a.w, a.y),
        |wmax AS (SELECT MAX(rk) AS wm FROM weekly),
        |origins AS (SELECT wm - UNNEST([8, 6, 4]) AS o FROM wmax),
        |horizons AS (SELECT UNNEST([1, 2]) AS h),
        |fits AS (SELECT o, COUNT(*) AS nw, SUM(rk) AS sx, SUM(y) AS sy,
        |           SUM(rk * y) AS sxy, SUM(rk * rk) AS sxx
        |         FROM weekly, origins WHERE rk < o GROUP BY o),
        |ab AS (SELECT o, nw, b_e6,
        |         CAST((CAST(sy AS HUGEINT) * 1000000 - CAST(b_e6 AS HUGEINT) * sx) // nw AS BIGINT) AS a_e6
        |       FROM (SELECT *,
        |               CAST((CAST(nw AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
        |                 // (CAST(nw AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS b_e6
        |             FROM fits) z),
        |naive AS (SELECT o, y AS f_naive FROM weekly, origins WHERE rk = o - 1)
        |SELECT CAST(g.o AS BIGINT) AS o, CAST(g.h AS BIGINT) AS h,
        |       CAST(actual AS BIGINT) AS actual,
        |       CAST(f_ols AS BIGINT) AS f_ols,
        |       CAST(f_naive AS BIGINT) AS f_naive,
        |       CAST(ABS(actual - f_ols) * 10000 // actual AS BIGINT) AS ape_ols_e4,
        |       CAST(ABS(actual - f_naive) * 10000 // actual AS BIGINT) AS ape_naive_e4
        |FROM (SELECT o, h FROM origins, horizons) g
        |  JOIN ab USING (o) JOIN naive USING (o)
        |  JOIN (SELECT rk AS ark, y AS actual FROM weekly) wk ON wk.ark = g.o + g.h - 1,
        |  LATERAL (SELECT (a_e6 + b_e6 * wk.ark) // 1000000 AS f_ols) f
        |ORDER BY o, h""".stripMargin,

    "q360_price_elasticity" ->
      """WITH li AS (SELECT l_partkey AS p, CAST(l_quantity AS BIGINT) AS q,
        |              CAST(round(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT)
        |                // CAST(l_quantity AS BIGINT) AS up
        |            FROM lineitem),
        |med AS (SELECT p, up AS med_up FROM
        |          (SELECT p, up, q, ROW_NUMBER() OVER (PARTITION BY p ORDER BY up, q) AS rk,
        |             COUNT(*) OVER (PARTITION BY p) AS nn
        |           FROM li) z
        |        WHERE rk = (nn + 1) // 2),
        |halves AS (SELECT li.p,
        |             SUM(CASE WHEN up <= med_up THEN q ELSE 0 END) AS q1,
        |             SUM(CASE WHEN up > med_up THEN q ELSE 0 END) AS q2,
        |             SUM(CASE WHEN up <= med_up THEN up * q ELSE 0 END) AS pw1,
        |             SUM(CASE WHEN up > med_up THEN up * q ELSE 0 END) AS pw2
        |           FROM li JOIN med USING (p) GROUP BY li.p),
        |els AS (SELECT p, (q2 - q1) * (p1 + p2) * 10000 // ((p2 - p1) * (q1 + q2)) AS els_e4
        |        FROM (SELECT p, q1, q2, pw1 // q1 AS p1, pw2 // q2 AS p2
        |              FROM halves WHERE q1 > 0 AND q2 > 0) z
        |        WHERE p2 > p1),
        |br AS (SELECT p_brand, els_e4, p FROM els JOIN part ON p = p_partkey),
        |medels AS (SELECT p_brand, els_e4 AS median_els_e4 FROM
        |             (SELECT p_brand, els_e4, p,
        |                ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY els_e4, p) AS rk,
        |                COUNT(*) OVER (PARTITION BY p_brand) AS nn
        |              FROM br) z
        |           WHERE rk = (nn + 1) // 2)
        |SELECT br.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |       CAST(SUM(CASE WHEN els_e4 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
        |       CAST(SUM(CASE WHEN els_e4 < 0 THEN 1 ELSE 0 END) * 10000
        |         // COUNT(*) AS BIGINT) AS neg_share_e4,
        |       CAST(MAX(median_els_e4) AS BIGINT) AS median_els_e4
        |FROM br JOIN medels USING (p_brand)
        |GROUP BY br.p_brand ORDER BY br.p_brand""".stripMargin
  )
}
