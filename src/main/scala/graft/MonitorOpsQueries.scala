package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-monitoring-ops wave (round 11): the three monitors a deployed
  * per-store forecasting service runs between retrains.
  *
  * Reference intent — every query names its consumer (r10 verdict
  * "next" #4):
  *  - q534: PSI (population stability index) between the reference
  *    snapshot and the live window is THE industry drift score model
  *    monitors alert on (banking/model-risk practice; the 0.1/0.2
  *    bands are the standard traffic lights). The reference retrains
  *    weekly on a timer (services/airflow/dags — cron, not drift);
  *    PSI is what tells it WHICH stores actually shifted. Consumer:
  *    the retrain scheduler over the ~1,115 per-store models; the
  *    drift family's missing member (q126 token drift, q131 decile
  *    drift, q147 KS, q424 CvM, q453 Wasserstein measure distributions
  *    — PSI is the binned score practitioners actually threshold).
  *    NEW SHARED KERNEL: ln(p/q) in e9 fixed point, exact integer
  *    arithmetic in BOTH engines — range-reduce by 2^k so the atanh
  *    argument z=(r−2^k)/(r+2^k) ≤ 0.1716, then 7 odd terms (z²≤0.0295
  *    → 34× decay/term, |err| < 1e-10·k-free) — no float ln anywhere.
  *  - q535: Trigg's tracking signal (Trigg 1964, the demand-planning
  *    standard): cumulative forecast error over cumulative |error| per
  *    store, flagged at |TS| ≥ 0.5. Bias the MAE can't see (errors
  *    that cancel in magnitude but not in sign) is exactly what kills
  *    replenishment. Consumer: the q31/q32 forecast loop — the signal
  *    that should trigger the reference's retrain EARLIER than its
  *    weekly cron; completes q401's EWMA control chart (on values)
  *    with the forecast-error instrument.
  *  - q536: the Theta method (Assimakopoulos & Nikolopoulos 2000) —
  *    the M3-competition winner and the single strongest simple
  *    univariate baseline: average of the θ=0 line (OLS trend) and a
  *    SES-smoothed θ=2 line (2y − trend). Consumer: a third arm for
  *    q524's Bates–Granger ensemble next to weekday-mean and level
  *    (the family: Holt q284, Holt–Winters q369, Croston q327 — Theta
  *    was the missing M3 baseline). OLS in DECIMAL-exact closed form
  *    (q154's discipline), SES as an integer fold replayed bit-equal
  *    by the spec.
  *
  * House rules: exact integers (cents, e4/e6/e9 scales), sign-explicit
  * sdiv everywhere a numerator can go negative, per-key windows only,
  * day-grain aggregates before any window, totally ordered outputs.
  */
object MonitorOpsQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** Mid-split decile-bin counts (g, bin, np, nq), landed ONCE per
    * (JVM, sfDir): the order-grain census — orders⋈customer scan,
    * per-nation exact nearest-rank decile edges over the first calendar
    * half, both halves binned by "edges strictly below" — is shared by
    * q534 (folds to one PSI per nation) and q568 (re-reads at per-bin
    * grain for the attribution drill-down; r12 verdict #5 — it
    * previously re-derived this whole census, 3.3 s). The edge join
    * aliases both sides explicitly (rk/tg) — `ranked("g") ===
    * targets("g")` on a shared lineage relied on analyzer self-join
    * disambiguation and warned 'g == g' (r12 verdict #5). */
  private[graft] def psiMidBins(s: SparkSession, dir: String): DataFrame = {
    val path = PipelineQueries.cachedFixture(s"psibins|$dir") { work =>
      val od = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("y"),
          col("o_orderkey").as("ok"))
      val mid = od.agg(expr("(min(dn) + max(dn)) div 2").as("mid"))
      val tagged = od.crossJoin(broadcast(mid))
      val base = tagged.filter(col("dn") <= col("mid"))
      val cur = tagged.filter(col("dn") > col("mid"))
      val nb = base.groupBy("g").agg(count(lit(1)).as("n_base"))
      val ranked = base.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy(col("y"), col("ok"))))
        .alias("rk")
      val targets = nb.select(col("g"), col("n_base"),
          explode(expr("sequence(1, 9)")).as("i"))
        .withColumn("tr", expr("(i * n_base + 9) div 10"))
        .alias("tg")
      val edges = ranked.join(targets,
          col("rk.g") === col("tg.g") && col("rk.rn") === col("tg.tr"))
        .groupBy(col("rk.g").as("g"))
        .agg(array_sort(collect_list(col("rk.y"))).as("edges"))
      def binned(df: DataFrame): DataFrame =
        df.join(broadcast(edges), Seq("g"))
          .withColumn("bin", expr("1 + size(filter(edges, e -> e < y))"))
          .groupBy("g", "bin").agg(count(lit(1)).as("n"))
      binned(base).withColumnRenamed("n", "np")
        .join(binned(cur).withColumnRenamed("n", "nq"), Seq("g", "bin"), "full")
        .na.fill(0L, Seq("np", "nq"))
        .coalesce(1).write.mode("overwrite").parquet(s"$work/bins")
    }
    s.read.parquet(s"$path/bins")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G479: PSI drift score with the fixed-point ln kernel ───────────
    // Baseline = first half of the calendar, current = second half.
    // Bin edges are the baseline's exact nearest-rank deciles PER
    // NATION (edge_i = value at rank ⌈i·N/10⌉); both windows are
    // binned by "count of edges strictly below", counts get +1 Laplace
    // smoothing over the realized bin count, shares are e6 (clipped
    // ≥ 1), PSI = Σ(p−q)·ln(p/q) lands at e9. Bands at the industry
    // 0.1 / 0.2 thresholds. All windows per-nation; the edge table is
    // 25×9 — node-count-sized metadata, never corpus-sized.
    "q534_psi_drift" -> ((s, dir) => {
      val bc = psiMidBins(s, dir)
      val tot = bc.groupBy("g").agg(sum("np").as("tp"), sum("nq").as("tq"),
        count(lit(1)).as("nbins"))
      // shares with +1 Laplace smoothing, e6, clipped ≥ 1 so the ratio
      // is finite and ≤ 1e6 (k ≤ 19 in the ln range reduction)
      val sh = bc.join(tot, Seq("g"))
        .withColumn("p", expr("greatest(1L, (np + 1) * 1000000 div (tp + nbins))"))
        .withColumn("q", expr("greatest(1L, (nq + 1) * 1000000 div (tq + nbins))"))
      // fixed-point ln(p/q) via the shared kernel (graft.ops.FixedLn —
      // staged columns, never textual nesting: q452's trap)
      val ln = graft.ops.FixedLn.lnE9(
          sh.withColumn("hi", greatest(col("p"), col("q")))
            .withColumn("lo", least(col("p"), col("q"))),
          "hi", "lo", "lnhl")
        // (p−q) and ln(p/q) always share a sign, so each term is ≥ 0
        .withColumn("term", expr("abs(p - q) * lnhl"))
      ln.groupBy("g")
        .agg(max("tp").as("n_base"), max("tq").as("n_cur"),
          expr("sum(term) div 1000000").as("psi_e9"))
        .withColumn("drift_band", expr("case when psi_e9 < 100000000 " +
          "then 'stable' when psi_e9 < 200000000 then 'moderate' " +
          "else 'shifted' end"))
        .orderBy("g")
    }),

    // ── G480: Trigg tracking signal over the forecast holdout ──────────
    // Weekday-mean forecast fit on dn ≤ max−28; over the 28-day
    // holdout, per nation in day order: TS_t = Σe / Σ|e| at e6,
    // flagged at |TS| ≥ 0.5. A dow unseen in training falls back to
    // the nation's overall training mean (coalesce, mirrored).
    "q535_tracking_signal" -> ((s, dir) => {
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val cut = nd.agg(expr("max(dn) - 28").as("cut"))
      val base = nd.crossJoin(broadcast(cut))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
      val train = base.filter(col("dn") <= col("cut"))
      val f = train.groupBy("g", "dow").agg(expr("sum(y) div count(1)").as("f"))
      val fb = train.groupBy("g").agg(expr("sum(y) div count(1)").as("fb"))
      val hold = base.filter(col("dn") > col("cut"))
        .join(f, Seq("g", "dow"), "left").join(fb, Seq("g"))
        .withColumn("e", col("y") - coalesce(col("f"), col("fb")))
      val w = Window.partitionBy("g").orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ts = hold
        .withColumn("ce", sum("e").over(w))
        .withColumn("ca", sum(abs(col("e"))).over(w))
        .withColumn("ts_e6", expr(sdiv("ce * 1000000", "greatest(ca, 1L)")))
        .withColumn("flag", expr("case when abs(ts_e6) >= 500000 then 1L else 0L end"))
      ts.groupBy("g")
        .agg(count(lit(1)).as("n_days"), sum("flag").as("n_flagged"),
          coalesce(min(when(col("flag") === 1L, col("dn"))), lit(-1L))
            .as("first_flag_dn"),
          max_by(col("ts_e6"), col("dn")).as("ts_final_e6"))
        .withColumn("bias", expr("case when ts_final_e6 > 0 then 'over' " +
          "when ts_final_e6 < 0 then 'under' else 'none' end"))
        .orderBy("g")
    }),

    // ── G481: Theta-method forecast (M3 baseline) vs weekday-mean ──────
    // Per nation on the observed-day grain: OLS trend on centered day
    // index (DECIMAL-exact closed form, slope/intercept at e6), θ=2
    // line 2y − trend, SES(α=0.3) over it as an integer fold (l +=
    // sdiv(3(th−l),10)), forecast = (SES level + extrapolated trend)/2
    // clamped ≥ 0. Scored on the 28-day holdout against the
    // weekday-mean arm.
    "q536_theta_method" -> ((s, dir) => {
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val cut = nd.agg(expr("max(dn) - 28").as("cut"), min("dn").as("d0"))
      val base = nd.crossJoin(broadcast(cut))
        .withColumn("x", col("dn") - col("d0"))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
      val train = base.filter(col("dn") <= col("cut"))
      val dec = "decimal(38, 0)"
      val ols = train.groupBy("g").agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .withColumn("bnum", expr(s"cast(n as $dec) * sxy - cast(sx as $dec) * sy"))
        .withColumn("bden", expr(s"cast(n as $dec) * sxx - cast(sx as $dec) * sx"))
        .withColumn("b_e6", expr("cast(" +
          sdiv("bnum * 1000000", "greatest(bden, cast(1 as decimal(38, 0)))") +
          " as bigint)"))
        .withColumn("a_e6", expr("cast(" +
          sdiv(s"cast(sy as $dec) * 1000000 - cast(b_e6 as $dec) * sx", "n") +
          " as bigint)"))
        .select("g", "b_e6", "a_e6")
      // θ=2 line per training day, SES fold in day order
      val ses = train.join(ols, Seq("g"))
        .withColumn("th", expr("2 * y - " +
          sdiv("a_e6 + b_e6 * x", "1000000")))
        .groupBy("g")
        .agg(expr("transform(array_sort(collect_list(struct(x, th))), " +
          "s -> s.th)").as("ths"))
        .withColumn("l", expr("aggregate(slice(ths, 2, size(ths) - 1), " +
          s"element_at(ths, 1), (acc, v) -> acc + ${sdiv("3 * (v - acc)", "10")})"))
        .select("g", "l")
      val fDow = train.groupBy("g", "dow").agg(expr("sum(y) div count(1)").as("fd"))
      val fAll = train.groupBy("g").agg(expr("sum(y) div count(1)").as("fa"))
      val hold = base.filter(col("dn") > col("cut"))
        .join(ols, Seq("g")).join(ses, Seq("g"))
        .join(fDow, Seq("g", "dow"), "left").join(fAll, Seq("g"))
        .withColumn("trend", expr(sdiv("a_e6 + b_e6 * x", "1000000")))
        .withColumn("f_theta", expr("greatest(0L, " + sdiv("l + trend", "2") + ")"))
        .withColumn("f_dow", coalesce(col("fd"), col("fa")))
      hold.groupBy("g")
        .agg(count(lit(1)).as("n_test"),
          expr("sum(abs(y - f_theta)) div count(1)").as("mae_theta"),
          expr("sum(abs(y - f_dow)) div count(1)").as("mae_dow"),
          max("b_e6").as("slope_e6"))
        .withColumn("winner", expr("case when mae_theta <= mae_dow " +
          "then 'theta' else 'dow_mean' end"))
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q534_psi_drift" -> {
      s"""WITH od AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
        |      AS dn,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS y,
        |    o.o_orderkey AS ok
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |mid AS (SELECT (MIN(dn) + MAX(dn)) // 2 AS mid FROM od),
        |base AS MATERIALIZED (SELECT od.* FROM od, mid WHERE dn <= mid),
        |cur AS MATERIALIZED (SELECT od.* FROM od, mid WHERE dn > mid),
        |nb AS (SELECT g, COUNT(*) AS n_base FROM base GROUP BY g),
        |ranked AS (SELECT g, y, ROW_NUMBER() OVER
        |    (PARTITION BY g ORDER BY y, ok) AS rn FROM base),
        |targets AS (SELECT g, (i * n_base + 9) // 10 AS tr
        |  FROM nb, (SELECT UNNEST(range(1, 10)) AS i)),
        |edges AS MATERIALIZED (SELECT r.g, list_sort(list(r.y)) AS edges
        |  FROM ranked r JOIN targets t ON r.g = t.g AND r.rn = t.tr
        |  GROUP BY r.g),
        |bb AS (SELECT b.g,
        |    1 + len(list_filter(e.edges, x -> x < b.y)) AS bin,
        |    COUNT(*) AS np
        |  FROM base b JOIN edges e ON b.g = e.g GROUP BY 1, 2),
        |cb AS (SELECT c.g,
        |    1 + len(list_filter(e.edges, x -> x < c.y)) AS bin,
        |    COUNT(*) AS nq
        |  FROM cur c JOIN edges e ON c.g = e.g GROUP BY 1, 2),
        |bc AS (SELECT COALESCE(bb.g, cb.g) AS g,
        |    COALESCE(bb.bin, cb.bin) AS bin,
        |    COALESCE(np, 0) AS np, COALESCE(nq, 0) AS nq
        |  FROM bb FULL JOIN cb ON bb.g = cb.g AND bb.bin = cb.bin),
        |tot AS (SELECT g, SUM(np) AS tp, SUM(nq) AS tq, COUNT(*) AS nbins
        |  FROM bc GROUP BY g),
        |sh AS (SELECT bc.g,
        |    GREATEST(1, (np + 1) * 1000000 // (tp + nbins)) AS p,
        |    GREATEST(1, (nq + 1) * 1000000 // (tq + nbins)) AS q,
        |    tp, tq
        |  FROM bc JOIN tot ON bc.g = tot.g),
        |c1 AS (SELECT g, p, q, tp, tq, GREATEST(p, q) AS hi,
        |    LEAST(p, q) AS lo FROM sh),
        |${graft.ops.FixedLn.sqlLnE9Stages("c1", "hi", "lo", "lnhl", "lx")},
        |t AS (SELECT g, tp, tq, ABS(p - q) * lnhl AS term FROM lx12),
        |agg AS (SELECT g, MAX(tp) AS n_base, MAX(tq) AS n_cur,
        |    SUM(term) // 1000000 AS psi_e9 FROM t GROUP BY g)
        |SELECT CAST(g AS BIGINT) AS g, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_cur AS BIGINT) AS n_cur, CAST(psi_e9 AS BIGINT) AS psi_e9,
        |  CASE WHEN psi_e9 < 100000000 THEN 'stable'
        |    WHEN psi_e9 < 200000000 THEN 'moderate' ELSE 'shifted' END
        |    AS drift_band
        |FROM agg ORDER BY g""".stripMargin
    },

    "q535_tracking_signal" ->
      s"""WITH nd AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
        |      AS dn,
        |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |cut AS (SELECT MAX(dn) - 28 AS cut FROM nd),
        |base AS MATERIALIZED (SELECT nd.*, ((dn % 7) + 7) % 7 AS dow,
        |    cut.cut FROM nd, cut),
        |f AS (SELECT g, dow, SUM(y) // COUNT(*) AS f FROM base
        |  WHERE dn <= cut GROUP BY 1, 2),
        |fb AS (SELECT g, SUM(y) // COUNT(*) AS fb FROM base
        |  WHERE dn <= cut GROUP BY 1),
        |hold AS (SELECT b.g, b.dn, b.y - COALESCE(f.f, fb.fb) AS e
        |  FROM base b LEFT JOIN f ON b.g = f.g AND b.dow = f.dow
        |  JOIN fb ON b.g = fb.g WHERE b.dn > b.cut),
        |ts AS (SELECT g, dn,
        |    SUM(e) OVER (PARTITION BY g ORDER BY dn) AS ce,
        |    SUM(ABS(e)) OVER (PARTITION BY g ORDER BY dn) AS ca
        |  FROM hold),
        |tf AS (SELECT g, dn,
        |    ${sdivSql("ce * 1000000", "GREATEST(ca, 1)")} AS ts_e6
        |  FROM ts),
        |fl AS (SELECT g, dn, ts_e6,
        |    CASE WHEN ABS(ts_e6) >= 500000 THEN 1 ELSE 0 END AS flag
        |  FROM tf)
        |SELECT CAST(g AS BIGINT) AS g, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(flag) AS BIGINT) AS n_flagged,
        |  CAST(COALESCE(MIN(CASE WHEN flag = 1 THEN dn END), -1) AS BIGINT)
        |    AS first_flag_dn,
        |  CAST(arg_max(ts_e6, dn) AS BIGINT) AS ts_final_e6,
        |  CASE WHEN arg_max(ts_e6, dn) > 0 THEN 'over'
        |    WHEN arg_max(ts_e6, dn) < 0 THEN 'under' ELSE 'none' END AS bias
        |FROM fl GROUP BY g ORDER BY g""".stripMargin,

    "q536_theta_method" ->
      s"""WITH nd AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
        |      AS dn,
        |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |cut AS (SELECT MAX(dn) - 28 AS cut, MIN(dn) AS d0 FROM nd),
        |base AS MATERIALIZED (SELECT nd.*, dn - d0 AS x,
        |    ((dn % 7) + 7) % 7 AS dow, cut.cut FROM nd, cut),
        |train AS MATERIALIZED (SELECT * FROM base WHERE dn <= cut),
        |ols0 AS (SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM train GROUP BY g),
        |ols1 AS (SELECT g, n, sx, sy,
        |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS bnum,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS bden
        |  FROM ols0),
        |ols2 AS (SELECT g, n, sx, sy, CAST(${sdivSql("bnum * 1000000",
            "GREATEST(bden, 1)")} AS BIGINT) AS b_e6 FROM ols1),
        |ols AS (SELECT g, b_e6, CAST(${sdivSql(
            "CAST(sy AS HUGEINT) * 1000000 - CAST(b_e6 AS HUGEINT) * sx",
            "n")} AS BIGINT) AS a_e6 FROM ols2),
        |ths AS (SELECT t.g, list(2 * t.y -
        |      ${sdivSql("o.a_e6 + o.b_e6 * t.x", "1000000")} ORDER BY t.x)
        |      AS ths
        |  FROM train t JOIN ols o ON t.g = o.g GROUP BY t.g),
        |ses AS (SELECT g, list_reduce(ths, (acc, v) -> acc +
        |    ${sdivSql("3 * (v - acc)", "10")}) AS l FROM ths),
        |fd AS (SELECT g, dow, SUM(y) // COUNT(*) AS fd FROM train
        |  GROUP BY 1, 2),
        |fa AS (SELECT g, SUM(y) // COUNT(*) AS fa FROM train GROUP BY 1),
        |hold AS (SELECT b.g, b.y,
        |    GREATEST(0, ${sdivSql(
            s"s.l + (${sdivSql("o.a_e6 + o.b_e6 * b.x", "1000000")})",
            "2")}) AS f_theta,
        |    COALESCE(fd.fd, fa.fa) AS f_dow, o.b_e6
        |  FROM base b JOIN ols o ON b.g = o.g JOIN ses s ON b.g = s.g
        |  LEFT JOIN fd ON b.g = fd.g AND b.dow = fd.dow
        |  JOIN fa ON b.g = fa.g
        |  WHERE b.dn > b.cut)
        |SELECT CAST(g AS BIGINT) AS g, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(ABS(y - f_theta)) // COUNT(*) AS BIGINT) AS mae_theta,
        |  CAST(SUM(ABS(y - f_dow)) // COUNT(*) AS BIGINT) AS mae_dow,
        |  CAST(MAX(b_e6) AS BIGINT) AS slope_e6,
        |  CASE WHEN SUM(ABS(y - f_theta)) // COUNT(*) <=
        |    SUM(ABS(y - f_dow)) // COUNT(*) THEN 'theta' ELSE 'dow_mean' END
        |    AS winner
        |FROM hold GROUP BY g ORDER BY g""".stripMargin
  )
}
