package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Supply-chain-science subsystem (round 10, forty-third wave): the
  * decision layer a sales forecast FEEDS — difference-in-differences
  * promotion uplift, Syntetos–Boylan demand-pattern classification,
  * lead-time-demand reorder points, and newsvendor stocking.
  *
  * Reference intent: the reference's per-store Prophet forecasts
  * (services/training-service/app/train_utils.py:24-35) exist to drive
  * exactly these downstream calls — how much to stock, which items need
  * intermittent-demand models (q327's Croston vs the smooth-series OLS),
  * and whether a promotion actually lifted sales. The reference stops at
  * the forecast; a 100-TB pipeline lands the decisions as data. All four
  * queries keep the house integer discipline: cents-scale BIGINT
  * aggregates, floor-div ratios at documented e-scales, nearest-rank
  * order statistics — no float crosses the engine boundary.
  */
object SupplyQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G290: difference-in-differences promotion uplift ───────────────
    // Treated customers (md5 mod 5 = 0) vs control, before/after a
    // data-anchored cutover (max order date − 1 year). DiD = (post−pre)
    // treated − (post−pre) control on mean order value in cents (means
    // are floor-div — documented; both engines share the floor). The
    // synthetic corpus has NO real treatment, so the honest estimate is
    // ≈ 0 — the null result the audit exists to certify (q335's Zipf
    // precedent). The parallel-trends gate that makes a DiD readable is
    // emitted alongside: per-group PRE-period monthly exact-OLS slopes
    // (e4 cents/month), whose gap must be small for the design to hold.
    // One corpus scan to (group, period) cells + one to monthly cells.
    "q345_did_uplift" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("d"), col("o_custkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"))
      val cut = o.agg(expr("date_sub(max(d), 365)").as("cut"))
      val base = o.crossJoin(broadcast(cut))
        .withColumn("treated", expr(
          "cast(conv(substring(md5(cast(o_custkey as string)), 1, 6), 16, 10) as bigint) % 5 = 0"))
        .withColumn("post", col("d") >= col("cut"))
      val cells = base.groupBy("treated", "post")
        .agg(count(lit(1)).as("n"), sum("v_c").as("sv"))
        .withColumn("mean_c", expr("sv div n"))
      // 2×2 pivot via conditional aggregation — one row out
      val did = cells.agg(
        sum(when(col("treated") && col("post"), col("mean_c"))).as("tt_post"),
        sum(when(col("treated") && !col("post"), col("mean_c"))).as("tt_pre"),
        sum(when(!col("treated") && col("post"), col("mean_c"))).as("ct_post"),
        sum(when(!col("treated") && !col("post"), col("mean_c"))).as("ct_pre"),
        sum("n").as("n_orders"))
        .withColumn("did_c", expr("(tt_post - tt_pre) - (ct_post - ct_pre)"))
      // parallel-trends: exact integer OLS slope of monthly mean value
      // over the PRE period, per group (x = months since pre start)
      val pre = base.filter(!col("post"))
        .groupBy(col("treated"), expr("(year(d) - 1990) * 12 + month(d)").as("m"))
        .agg(expr("sum(v_c) div count(1)").as("y"))
        .withColumn("x", col("m") - min("m").over(Window.partitionBy("treated")))
      val slopes = pre.groupBy("treated")
        .agg(count(lit(1)).as("nm"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .withColumn("slope_e4", expr(
          "(nm * sxy - sx * sy) * 10000 div (nm * sxx - sx * sx)"))
      did.crossJoin(broadcast(
          slopes.agg(
            sum(when(col("treated"), col("slope_e4"))).as("pre_slope_t_e4"),
            sum(when(!col("treated"), col("slope_e4"))).as("pre_slope_c_e4"))))
        .select(col("n_orders"), col("tt_pre"), col("tt_post"), col("ct_pre"),
          col("ct_post"), col("did_c"), col("pre_slope_t_e4"), col("pre_slope_c_e4"))
    }),

    // ── G291: Syntetos–Boylan demand-pattern classification ────────────
    // Per part, from its daily demand series: ADI (mean inter-demand
    // interval, e2) and CV² of demand sizes (e4), cut at the published
    // SBC boundaries ADI ≥ 1.32, CV² ≥ 0.49 into smooth / intermittent
    // / erratic / lumpy — the router that decides Croston (q327) vs
    // plain OLS (q31) per item. ADI_e2 = span·100 div (n−1) over
    // demand DAYS (inclusive span needs n ≥ 2); CV²_e4 uses the
    // population variance with every term cleared: n²·Σx²−n·(Σx)² over
    // (Σx)² — DECIMAL(38,0) since cents² at part scale outruns BIGINT.
    // One corpus shuffle to (part, day), one to part grain, census out.
    "q346_sbc_classify" -> ((s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), to_date(col("o_orderdate")).as("d")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey").as("p"), col("d"))
        .agg(sum(expr("cast(l_quantity as bigint)")).as("q"))
      val parts = daily.groupBy("p")
        .agg(count(lit(1)).as("n"), min("d").as("d0"), max("d").as("d1"),
          sum("q").as("sq"), sum(expr("q * q")).as("sqq"))
        .filter(col("n") >= 2)
        .withColumn("adi_e2", expr("(datediff(d1, d0) + 1) * 100 div (n - 1)"))
        .withColumn("cv2_e4", expr(
          "cast((cast(n as decimal(38,0)) * n * sqq - cast(n as decimal(38,0)) * sq * sq) * 10000" +
            " div (cast(sq as decimal(38,0)) * sq) as bigint)"))
        .withColumn("cls", expr(
          "case when adi_e2 < 132 and cv2_e4 < 4900 then 'smooth' " +
            "when adi_e2 >= 132 and cv2_e4 < 4900 then 'intermittent' " +
            "when adi_e2 < 132 then 'erratic' else 'lumpy' end"))
      parts.groupBy("cls")
        .agg(count(lit(1)).as("n_parts"),
          expr("sum(adi_e2) div count(1)").as("mean_adi_e2"),
          expr("sum(cv2_e4) div count(1)").as("mean_cv2_e4"),
          sum("sq").as("total_qty"))
        .orderBy("cls")
    }),

    // ── G292: lead-time-demand reorder point (empirical service level) ─
    // Per region: daily demand in units, 7-day lead-time demand as a
    // RANGE-frame trailing sum over the date spine (gap days count as
    // zero demand BY CONSTRUCTION of the range frame — no spine fill
    // needed), reorder point R = nearest-rank p95 of the realized
    // lead-time demands, and the achieved service level re-measured
    // against the same realizations (share with LTD ≤ R — ≥ 95% by the
    // nearest-rank definition, the spec pins it). Day grain throughout:
    // corpus → (region, day) cells in one shuffle, windows partitioned.
    "q347_reorder_point" -> ((s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("d")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("r"), col("d"))
        .agg(sum(expr("cast(l_quantity as bigint)")).as("q"))
      // RANGE frame over the integer DAY NUMBER (portable: Spark's range
      // frame takes long offsets, DuckDB's date-arithmetic day count is
      // the same integer — no epoch/double conversion in either engine)
      val wLt = Window.partitionBy("r")
        .orderBy(expr("datediff(d, date '1970-01-01')"))
        .rangeBetween(-6L, 0)
      val ltd = daily.withColumn("ltd", sum("q").over(wLt))
      val ranked = ltd
        .withColumn("rk", row_number().over(Window.partitionBy("r").orderBy(col("ltd").asc, col("d").asc)))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy("r")))
      val rp = ranked.filter(col("rk") === expr("(nd * 95 + 99) div 100"))
        .select(col("r"), col("ltd").as("reorder_point"))
      ltd.join(broadcast(rp), Seq("r"))
        .groupBy("r")
        .agg(count(lit(1)).as("n_days"),
          max("reorder_point").as("reorder_point"),
          expr("sum(q) div count(1)").as("mean_daily_qty"),
          max("ltd").as("max_ltd"),
          expr("sum(case when ltd <= reorder_point then 1 else 0 end) * 10000 div count(1)")
            .as("service_e4"))
        .withColumn("r", col("r").cast(LongType))
        .orderBy("r")
    }),

    // ── G293: newsvendor stocking (critical ratio on the empirical
    // CDF) + profit audit ──
    // Per region, unit profit cu = 3, unit overage cost co = 1 →
    // critical ratio 3/4; the newsvendor-optimal stock is the smallest
    // q with F(q) ≥ 0.75 = the nearest-rank p75 of daily demand. The
    // audit EVALUATES the choice on the same empirical distribution:
    // realized profit Σ (cu·min(d,q*) − co·max(q*−d, 0)) in exact
    // units, against the naive mean-demand stocking — newsvendor
    // optimality makes the gap provably ≥ 0 on the fitting sample
    // (the spec pins it). Day cells, two broadcast stock levels.
    "q348_newsvendor" -> ((s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("d")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("r"), col("d"))
        .agg(sum(expr("cast(l_quantity as bigint)")).as("q"))
      val ranked = daily
        .withColumn("rk", row_number().over(Window.partitionBy("r").orderBy(col("q").asc, col("d").asc)))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy("r")))
      val stock = ranked.filter(col("rk") === expr("(nd * 75 + 99) div 100"))
        .select(col("r"), col("q").as("q_star"))
      val mean = daily.groupBy("r").agg(expr("sum(q) div count(1)").as("q_mean"))
      daily.join(broadcast(stock), Seq("r")).join(broadcast(mean), Seq("r"))
        .groupBy("r")
        .agg(count(lit(1)).as("n_days"),
          max("q_star").as("q_star"), max("q_mean").as("q_mean"),
          sum(expr("3 * least(q, q_star) - 1 * greatest(q_star - q, 0)")).as("profit_star"),
          sum(expr("3 * least(q, q_mean) - 1 * greatest(q_mean - q, 0)")).as("profit_mean"))
        .withColumn("nv_gain", expr("profit_star - profit_mean"))
        .withColumn("r", col("r").cast(LongType))
        .orderBy("r")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q345_did_uplift" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, o_custkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c
        |           FROM orders),
        |cut AS (SELECT MAX(d) - 365 AS cut FROM o),
        |base AS (SELECT d, v_c,
        |           CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 6) AS BIGINT)
        |             % 5 = 0 AS treated,
        |           d >= cut AS post
        |         FROM o, cut),
        |cells AS (SELECT treated, post, COUNT(*) AS n, SUM(v_c) // COUNT(*) AS mean_c
        |          FROM base GROUP BY 1, 2),
        |did AS (SELECT SUM(CASE WHEN treated AND post THEN mean_c END) AS tt_post,
        |               SUM(CASE WHEN treated AND NOT post THEN mean_c END) AS tt_pre,
        |               SUM(CASE WHEN NOT treated AND post THEN mean_c END) AS ct_post,
        |               SUM(CASE WHEN NOT treated AND NOT post THEN mean_c END) AS ct_pre,
        |               SUM(n) AS n_orders
        |        FROM cells),
        |pre AS (SELECT treated, (year(d) - 1990) * 12 + month(d) AS m,
        |          SUM(v_c) // COUNT(*) AS y
        |        FROM base WHERE NOT post GROUP BY 1, 2),
        |px AS (SELECT treated, y, m - MIN(m) OVER (PARTITION BY treated) AS x FROM pre),
        |sl AS (SELECT treated,
        |         (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) * 10000
        |           // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS slope_e4
        |       FROM px GROUP BY treated),
        |pt AS (SELECT SUM(CASE WHEN treated THEN slope_e4 END) AS pre_slope_t_e4,
        |              SUM(CASE WHEN NOT treated THEN slope_e4 END) AS pre_slope_c_e4
        |       FROM sl)
        |SELECT CAST(n_orders AS BIGINT) AS n_orders,
        |       CAST(tt_pre AS BIGINT) AS tt_pre, CAST(tt_post AS BIGINT) AS tt_post,
        |       CAST(ct_pre AS BIGINT) AS ct_pre, CAST(ct_post AS BIGINT) AS ct_post,
        |       CAST((tt_post - tt_pre) - (ct_post - ct_pre) AS BIGINT) AS did_c,
        |       CAST(pre_slope_t_e4 AS BIGINT) AS pre_slope_t_e4,
        |       CAST(pre_slope_c_e4 AS BIGINT) AS pre_slope_c_e4
        |FROM did, pt""".stripMargin,

    "q346_sbc_classify" ->
      """WITH daily AS (SELECT l_partkey AS p, CAST(o_orderdate AS DATE) AS d,
        |                 SUM(CAST(l_quantity AS BIGINT)) AS q
        |               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |               GROUP BY 1, 2),
        |parts AS (SELECT p, COUNT(*) AS n, MIN(d) AS d0, MAX(d) AS d1,
        |            SUM(q) AS sq, SUM(q * q) AS sqq
        |          FROM daily GROUP BY p HAVING COUNT(*) >= 2),
        |m AS (SELECT p, sq,
        |        (CAST(d1 - d0 AS BIGINT) + 1) * 100 // (n - 1) AS adi_e2,
        |        CAST((CAST(n AS HUGEINT) * n * sqq - CAST(n AS HUGEINT) * sq * sq) * 10000
        |          // (CAST(sq AS HUGEINT) * sq) AS BIGINT) AS cv2_e4
        |      FROM parts),
        |cls AS (SELECT *, CASE WHEN adi_e2 < 132 AND cv2_e4 < 4900 THEN 'smooth'
        |                  WHEN adi_e2 >= 132 AND cv2_e4 < 4900 THEN 'intermittent'
        |                  WHEN adi_e2 < 132 THEN 'erratic' ELSE 'lumpy' END AS cls
        |        FROM m)
        |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |       CAST(SUM(adi_e2) // COUNT(*) AS BIGINT) AS mean_adi_e2,
        |       CAST(SUM(cv2_e4) // COUNT(*) AS BIGINT) AS mean_cv2_e4,
        |       CAST(SUM(sq) AS BIGINT) AS total_qty
        |FROM cls GROUP BY cls ORDER BY cls""".stripMargin,

    "q347_reorder_point" ->
      """WITH daily AS (SELECT n_regionkey AS r, CAST(o_orderdate AS DATE) AS d,
        |                 SUM(CAST(l_quantity AS BIGINT)) AS q
        |               FROM lineitem
        |                 JOIN orders ON l_orderkey = o_orderkey
        |                 JOIN customer ON o_custkey = c_custkey
        |                 JOIN nation ON c_nationkey = n_nationkey
        |               GROUP BY 1, 2),
        |ltd AS (SELECT r, d, q,
        |          SUM(q) OVER (PARTITION BY r ORDER BY d - DATE '1970-01-01'
        |                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS ltd
        |        FROM daily),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY r ORDER BY ltd, d) AS rk,
        |             COUNT(*) OVER (PARTITION BY r) AS nd
        |           FROM ltd),
        |rp AS (SELECT r, ltd AS reorder_point FROM ranked
        |       WHERE rk = (nd * 95 + 99) // 100)
        |SELECT CAST(ltd.r AS BIGINT) AS r, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(MAX(reorder_point) AS BIGINT) AS reorder_point,
        |       CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_daily_qty,
        |       CAST(MAX(ltd.ltd) AS BIGINT) AS max_ltd,
        |       CAST(SUM(CASE WHEN ltd.ltd <= reorder_point THEN 1 ELSE 0 END) * 10000
        |         // COUNT(*) AS BIGINT) AS service_e4
        |FROM ltd JOIN rp ON ltd.r = rp.r
        |GROUP BY ltd.r ORDER BY r""".stripMargin,

    "q348_newsvendor" ->
      """WITH daily AS (SELECT n_regionkey AS r, CAST(o_orderdate AS DATE) AS d,
        |                 SUM(CAST(l_quantity AS BIGINT)) AS q
        |               FROM lineitem
        |                 JOIN orders ON l_orderkey = o_orderkey
        |                 JOIN customer ON o_custkey = c_custkey
        |                 JOIN nation ON c_nationkey = n_nationkey
        |               GROUP BY 1, 2),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY r ORDER BY q, d) AS rk,
        |             COUNT(*) OVER (PARTITION BY r) AS nd
        |           FROM daily),
        |stock AS (SELECT r, q AS q_star FROM ranked WHERE rk = (nd * 75 + 99) // 100),
        |mn AS (SELECT r, SUM(q) // COUNT(*) AS q_mean FROM daily GROUP BY r)
        |SELECT CAST(daily.r AS BIGINT) AS r, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(MAX(q_star) AS BIGINT) AS q_star,
        |       CAST(MAX(q_mean) AS BIGINT) AS q_mean,
        |       CAST(SUM(3 * LEAST(q, q_star) - 1 * GREATEST(q_star - q, 0)) AS BIGINT) AS profit_star,
        |       CAST(SUM(3 * LEAST(q, q_mean) - 1 * GREATEST(q_mean - q, 0)) AS BIGINT) AS profit_mean,
        |       CAST(SUM(3 * LEAST(q, q_star) - 1 * GREATEST(q_star - q, 0))
        |          - SUM(3 * LEAST(q, q_mean) - 1 * GREATEST(q_mean - q, 0)) AS BIGINT) AS nv_gain
        |FROM daily JOIN stock ON daily.r = stock.r JOIN mn ON daily.r = mn.r
        |GROUP BY daily.r ORDER BY r""".stripMargin
  )
}
