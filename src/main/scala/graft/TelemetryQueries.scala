package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.boundedGlobalRank

/** Telemetry/queueing wave (round 10, sixty-fourth wave): Lindley
  * waiting-time recursion with its max-plus certificate, Little's law
  * as an exact integer identity, multi-window SLO burn-rate alerting,
  * and Gorilla-style delta-of-delta timestamp-compression costing.
  *
  * Reference intent: the reference fronts request serving with nginx
  * (services/nginx/default.conf.template) and scrapes metrics into
  * Prometheus/Grafana (services/prometheus/prometheus.yaml,
  * services/grafana/grafana_dashboards.yml) but runs no latency
  * simulation, no queueing identity check, and no SLO alerting
  * policy over what it scrapes. q429 replays each user's event stream
  * through a single-worker queue via the Lindley recursion
  * W_{i} = max(0, W_{i-1} + S_{i-1} - (A_i - A_{i-1})) (Lindley 1952)
  * — and certifies EVERY step against the max-plus closed form
  * W_i = max_{k<=i}(A_k - C_{k-1}) + C_{i-1} - A_i, violations
  * counted at zero, not assumed. q430 certifies Little's law L = λW
  * (Little 1961) in its exact finite-horizon form: the day-integral
  * of in-flight orders equals the sum of order durations — two
  * different plans, one integer identity. q431 runs the SRE
  * multi-window multi-burn-rate alert policy (Beyer et al., the SRE
  * workbook ch. 5) over a deterministic error stream with injected
  * incident days. q432 prices the events stream's timestamps under
  * the Gorilla delta-of-delta ladder (Pelkonen et al., VLDB 2015) —
  * the storage-economics family of q250/q304/q330, extended to
  * time-series compression.
  */
object TelemetryQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G374: Lindley recursion + max-plus certificate ─────────────────
    // Per user, events in (us, eid) order are arrivals at a dedicated
    // single worker; service time is deterministic from the event
    // identity: S = (3600 + md5_60(u:us:eid) mod 28800) s — mean
    // ~2.5 h against a ~10 h mean inter-arrival gap, so queueing
    // happens in bursts. The fold carries BOTH forms at once: the
    // recurrence W_i and the max-plus ingredients (M_i = max_k of
    // A_k − C_{k−1}, C the cumulative service), and counts per-event
    // disagreements — the identity W_i = M_i + C_{i−1} − A_i is the
    // checkpoint-restart trust property of this state (q385's
    // discipline: certified, not cited). All micros, all BIGINT;
    // utilization lifts to DECIMAL(38,0) because Σbusy·10⁴ clears
    // BIGINT at sf0.1. The oracle replays the identical fold as a
    // RECURSIVE CTE over per-user ranks; the spec replays every user
    // in the driver at sf0.001.
    "q429_lindley_queue" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
      val svc = "((3600L + pmod(md5_60(concat(cast(u as string), ':', " +
        "cast(z.us as string), ':', cast(z.eid as string))), 28800L)) * 1000000L)"
      val wn = "greatest(0L, acc.w + acc.s - (z.us - acc.a))"
      val mn = "greatest(acc.m, z.us - acc.cs)"
      val perUser = ev.groupBy("u")
        .agg(expr("array_sort(collect_list(struct(us, eid)))").as("xs"),
          count(lit(1)).as("n_u"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('a', -1L, 'f', 0L, 'cs', 0L, 's', 0L, 'w', 0L,
             |    'm', 0L, 'sw', 0L, 'mw', 0L, 'nw', 0L, 'vi', 0L),
             |  (acc, z) -> case when acc.a = -1L then named_struct(
             |      'a', z.us, 'f', z.us, 'cs', $svc, 's', $svc, 'w', 0L,
             |      'm', z.us, 'sw', 0L, 'mw', 0L, 'nw', 0L, 'vi', 0L)
             |    else named_struct(
             |      'a', z.us, 'f', acc.f,
             |      'cs', acc.cs + $svc,
             |      's', $svc,
             |      'w', $wn,
             |      'm', $mn,
             |      'sw', acc.sw + $wn,
             |      'mw', greatest(acc.mw, $wn),
             |      'nw', acc.nw + (case when $wn > 0L then 1L else 0L end),
             |      'vi', acc.vi + (case when $wn != $mn + acc.cs - z.us
             |                      then 1L else 0L end)) end)""".stripMargin))
        .select(col("u"), col("n_u"),
          expr("st.sw").as("sw"), expr("st.mw").as("mw"),
          expr("st.nw").as("nw"), expr("st.vi").as("vi"),
          expr("st.cs").as("busy"),
          expr("st.a + st.w + st.s - st.f").as("horizon"),
          expr("md5_60(concat(cast(u as string), ':', cast(st.w as string)))")
            .as("rc"))
      perUser.agg(
          sum("n_u").as("n"), count(lit(1)).as("n_users"),
          sum("nw").as("n_waited"), sum("vi").as("n_viol"),
          sum("sw").as("sw"), max("mw").as("mw"),
          sum("busy").as("busy"), sum("horizon").as("hz"),
          expr("bit_xor(rc)").as("xor60_final_wait"))
        .select(col("n"), col("n_users"), col("n_waited"),
          expr("sw div 1000000").as("sum_wait_s"),
          expr("mw div 1000000").as("max_wait_s"),
          expr("sw div (n * 1000)").as("mean_wait_ms"),
          expr("cast(cast(busy as decimal(38, 0)) * 10000 div hz as bigint)")
            .as("util_e4"),
          col("n_viol"), col("xor60_final_wait"))
    }),

    // ── G375: Little's law — the exact finite-horizon identity ─────────
    // Order i is in flight from o_orderdate through max(l_shipdate)
    // (folded up to the start when the generator ships early — q373's
    // well-formedness rule). Two INDEPENDENT plans: (a) the sweep-line
    // day-integral of concurrent orders (q215's ±1 delta table, open
    // level × run length between delta days), (b) Σ per-order
    // durations. Little's identity says they are EQUAL — not close,
    // equal — and L = λ·W̄ follows in exact rationals, so one integer
    // equality certifies the law at this horizon. Orders with no line
    // items are excluded and counted.
    "q430_littles_law" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("okey"))
        .agg(max(to_date(col("l_shipdate"))).as("e0"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("okey"), to_date(col("o_orderdate")).as("st"))
      val spans = o.join(li, Seq("okey"))
        .select(col("okey"), col("st"), greatest(col("e0"), col("st")).as("en"))
      val nAll = Tables.orders(s, dir).agg(count(lit(1)).as("n_all"))
      val deltas = spans.select(col("st").as("day"), lit(1L).as("d"))
        .unionByName(spans.select(date_add(col("en"), 1).as("day"), lit(-1L).as("d")))
        .groupBy("day").agg(sum("d").as("delta"))
      // delta-day grain: ≤ 2 rows per observed calendar day (allowlisted)
      val curve = deltas
        .withColumn("open", sum("delta").over(
          boundedGlobalRank(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nxt", lead(col("day"), 1).over(boundedGlobalRank(col("day"))))
      val area = curve.agg(
        sum(expr("open * cast(coalesce(datediff(nxt, day), 0) as bigint)")).as("area_days"),
        max("open").as("peak_open"))
      val peakDay = curve.crossJoin(broadcast(area.select(col("peak_open").as("po"))))
        .filter(col("open") === col("po")).agg(min("day").as("peak_day"))
      val sums = spans.agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(datediff(en, st) + 1 as bigint)")).as("sum_dur_days"),
        min("st").as("d0"), max("en").as("d1"))
      sums.crossJoin(broadcast(nAll)).crossJoin(broadcast(area))
        .crossJoin(broadcast(peakDay))
        .withColumn("n_days", expr("cast(datediff(d1, d0) + 1 as bigint)"))
        .select(col("n_orders"), expr("n_all - n_orders").as("n_excluded"),
          col("n_days"), col("area_days"), col("sum_dur_days"),
          expr("case when area_days = sum_dur_days then 1L else 0L end")
            .as("identity_ok"),
          expr("area_days * 1000000 div n_days").as("l_e6"),
          expr("n_orders * 1000000 div n_days").as("lambda_e6"),
          expr("sum_dur_days * 1000000 div n_orders").as("w_mean_e6"),
          col("peak_open"), col("peak_day"))
    }),

    // ── G376: multi-window multi-burn-rate SLO alerts ──────────────────
    // SLO: 98 % success ⇒ 2 % error budget. Error flag is
    // deterministic per event (md5_60(eid) mod 1000 < threshold) with
    // INJECTED incident days — every 11th day from the 2024-01-01
    // anchor runs at 40 % errors vs the 1.5 % baseline — so the alert
    // logic is exercised, not vacuous. Burn rate over window w =
    // (err_w / n_w) / 0.02, exact at e4 as err_w·500000 div n_w.
    // Policy (the SRE workbook's two-window rule, day-granular): PAGE
    // iff burn_1d ≥ 10× AND burn_3d ≥ 5×; TICKET iff burn_3d ≥ 2×
    // AND burn_7d ≥ 1×. The long window keeps one-day blips from
    // paging; the short window ends the alert as soon as the incident
    // stops burning. Day grain is calendar-span-bounded (allowlisted
    // unpartitioned RANGE windows).
    "q431_burn_rate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_id").as("eid"))
        .withColumn("e", expr(
          """case when pmod(md5_60(cast(eid as string)), 1000) <
            |  (case when pmod(datediff(d, to_date('2024-01-01')), 11) = 3
            |   then 400L else 15L end) then 1L else 0L end""".stripMargin))
      val daily = ev.groupBy("d")
        .agg(count(lit(1)).as("n"), sum("e").as("err"))
      val d0 = daily.agg(min("d").as("d0"))
      val w3 = boundedGlobalRank(col("i")).rangeBetween(-2, 0)
      val w7 = boundedGlobalRank(col("i")).rangeBetween(-6, 0)
      daily.crossJoin(broadcast(d0))
        .withColumn("i", expr("cast(datediff(d, d0) as bigint)"))
        .withColumn("n3", sum("n").over(w3)).withColumn("e3", sum("err").over(w3))
        .withColumn("n7", sum("n").over(w7)).withColumn("e7", sum("err").over(w7))
        .withColumn("burn1_e4", expr("err * 500000 div n"))
        .withColumn("burn3_e4", expr("e3 * 500000 div n3"))
        .withColumn("burn7_e4", expr("e7 * 500000 div n7"))
        .select(col("d"), col("n"), col("err"),
          col("burn1_e4"), col("burn3_e4"), col("burn7_e4"),
          expr("case when burn1_e4 >= 100000 and burn3_e4 >= 50000 " +
            "then 1L else 0L end").as("page"),
          expr("case when burn3_e4 >= 20000 and burn7_e4 >= 10000 " +
            "then 1L else 0L end").as("ticket"))
        .orderBy("d")
    }),

    // ── G377: Gorilla delta-of-delta timestamp costing ─────────────────
    // Per user stream in (us, eid) order, timestamps at second
    // resolution. The Gorilla ladder (VLDB'15 §4.1, adapted):
    // header 64 bits; first delta 27 bits; then dod = Δt_i − Δt_{i−1}
    // costs 1 bit if 0, 9 if in [−63,64], 12 if in [−255,256], 16 if
    // in [−2047,2048], else 37 (5-bit prefix + 32-bit value). The
    // delta-only arm prices the same ladder on Δt directly. On
    // bursty-random synthetic arrivals dod stays wide — the honest
    // result: DoD pays off on PERIODIC telemetry, and the bucket
    // census says exactly how far from periodic this stream is. Lag
    // windows are partitioned by user — never global.
    "q432_gorilla_bits" -> ((s, dir) => {
      val w = Window.partitionBy("u").orderBy("us", "eid")
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
        .withColumn("t", expr("us div 1000000"))
        .withColumn("i", row_number().over(w))
        .withColumn("dt", col("t") - lag(col("t"), 1).over(w))
        .withColumn("dod", col("dt") - lag(col("dt"), 1).over(w))
        .withColumn("bits", expr(
          """case when i = 1 then 64L when i = 2 then 27L
            |     when dod = 0 then 1L
            |     when dod between -63 and 64 then 9L
            |     when dod between -255 and 256 then 12L
            |     when dod between -2047 and 2048 then 16L
            |     else 37L end""".stripMargin))
        .withColumn("dbits", expr(
          """case when i = 1 then 64L
            |     when dt = 0 then 1L
            |     when dt between -63 and 64 then 9L
            |     when dt between -255 and 256 then 12L
            |     when dt between -2047 and 2048 then 16L
            |     else 37L end""".stripMargin))
      ev.agg(count(lit(1)).as("n_events"),
          sum(expr("case when i = 1 then 1L else 0L end")).as("n_streams"),
          sum(col("bits")).as("dod_bits"), sum(col("dbits")).as("delta_bits"),
          sum(expr("case when i >= 3 and dod = 0 then 1L else 0L end")).as("n_dod_zero"),
          sum(expr("case when i >= 3 and dod != 0 and dod between -63 and 64 " +
            "then 1L else 0L end")).as("n_dod_7b"),
          sum(expr("case when i >= 3 and not dod between -63 and 64 " +
            "and dod between -255 and 256 then 1L else 0L end")).as("n_dod_9b"),
          sum(expr("case when i >= 3 and not dod between -255 and 256 " +
            "and dod between -2047 and 2048 then 1L else 0L end")).as("n_dod_12b"),
          sum(expr("case when i >= 3 and not dod between -2047 and 2048 " +
            "then 1L else 0L end")).as("n_dod_32b"))
        .withColumn("raw_bits", expr("n_events * 64"))
        .select(col("n_events"), col("n_streams"), col("raw_bits"),
          col("delta_bits"), col("dod_bits"),
          col("n_dod_zero"), col("n_dod_7b"), col("n_dod_9b"),
          col("n_dod_12b"), col("n_dod_32b"),
          expr("dod_bits * 10000 div raw_bits").as("dod_ratio_e4"),
          expr("delta_bits * 10000 div raw_bits").as("delta_ratio_e4"))
    })
  )

  def oracleSql: Map[String, String] = {
    val svc1 = "(3600 + CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || " +
      "CAST(us AS VARCHAR) || ':' || CAST(eid AS VARCHAR)), 1, 15) AS BIGINT) " +
      "% 28800) * 1000000"
    val svc2 = "(3600 + CAST('0x' || substr(md5(CAST(s2.u AS VARCHAR) || ':' || " +
      "CAST(s2.us AS VARCHAR) || ':' || CAST(s2.eid AS VARCHAR)), 1, 15) AS BIGINT) " +
      "% 28800) * 1000000"
    val wnS = "GREATEST(0, r.w + r.s - (s2.us - r.a))"
    val mnS = "GREATEST(r.m, s2.us - r.cs)"
    Map(

    "q429_lindley_queue" ->
      s"""WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid FROM events),
        |seq AS (SELECT u, us, eid,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |nu AS (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, i, us AS a, us AS f, $svc1 AS cs, $svc1 AS s,
        |    0::BIGINT AS w, us AS m, 0::BIGINT AS sw, 0::BIGINT AS mw,
        |    0::BIGINT AS nw, 0::BIGINT AS vi
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s2.u, s2.i, s2.us, r.f, r.cs + $svc2, $svc2,
        |    $wnS,
        |    $mnS,
        |    r.sw + $wnS,
        |    GREATEST(r.mw, $wnS),
        |    r.nw + CASE WHEN $wnS > 0 THEN 1 ELSE 0 END,
        |    r.vi + CASE WHEN $wnS != $mnS + r.cs - s2.us THEN 1 ELSE 0 END
        |  FROM rec r JOIN seq s2 ON s2.u = r.u AND s2.i = r.i + 1),
        |fin AS (SELECT r.*, nu.n_u FROM rec r JOIN nu ON r.u = nu.u
        |        WHERE r.i = nu.n_u)
        |SELECT CAST(SUM(n_u) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(nw) AS BIGINT) AS n_waited,
        |  CAST(SUM(sw) // 1000000 AS BIGINT) AS sum_wait_s,
        |  CAST(MAX(mw) // 1000000 AS BIGINT) AS max_wait_s,
        |  CAST(SUM(sw) // (SUM(n_u) * 1000) AS BIGINT) AS mean_wait_ms,
        |  CAST(CAST(SUM(cs) AS HUGEINT) * 10000 // SUM(a + w + s - f)
        |    AS BIGINT) AS util_e4,
        |  CAST(SUM(vi) AS BIGINT) AS n_viol,
        |  bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |    CAST(w AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_final_wait
        |FROM fin""".stripMargin,

    "q430_littles_law" ->
      """WITH spans AS (
        |  SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS st,
        |    GREATEST(MAX(CAST(l_shipdate AS DATE)), CAST(o_orderdate AS DATE))
        |      AS en
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |deltas AS (
        |  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
        |    SELECT st AS day, 1 AS d FROM spans
        |    UNION ALL SELECT en + 1, -1 FROM spans) z
        |  GROUP BY day),
        |curve AS (SELECT day,
        |    SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS open,
        |    LEAD(day) OVER (ORDER BY day) AS nxt
        |  FROM deltas),
        |area AS (SELECT SUM(open * COALESCE(date_diff('day', day, nxt), 0))
        |    AS area_days, MAX(open) AS peak_open FROM curve),
        |pk AS (SELECT MIN(day) AS peak_day FROM curve, area
        |       WHERE curve.open = area.peak_open),
        |sums AS (SELECT COUNT(*) AS n_orders,
        |    SUM(date_diff('day', st, en) + 1) AS sum_dur_days,
        |    MIN(st) AS d0, MAX(en) AS d1 FROM spans),
        |na AS (SELECT COUNT(*) AS n_all FROM orders)
        |SELECT CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(n_all - n_orders AS BIGINT) AS n_excluded,
        |  CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n_days,
        |  CAST(area_days AS BIGINT) AS area_days,
        |  CAST(sum_dur_days AS BIGINT) AS sum_dur_days,
        |  CAST(CASE WHEN area_days = sum_dur_days THEN 1 ELSE 0 END AS BIGINT)
        |    AS identity_ok,
        |  CAST(area_days * 1000000 // (date_diff('day', d0, d1) + 1) AS BIGINT)
        |    AS l_e6,
        |  CAST(n_orders * 1000000 // (date_diff('day', d0, d1) + 1) AS BIGINT)
        |    AS lambda_e6,
        |  CAST(sum_dur_days * 1000000 // n_orders AS BIGINT) AS w_mean_e6,
        |  CAST(peak_open AS BIGINT) AS peak_open,
        |  CAST(peak_day AS DATE) AS peak_day
        |FROM sums, na, area, pk""".stripMargin,

    "q431_burn_rate" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, event_id AS eid FROM events),
        |fl AS (SELECT d,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(eid AS VARCHAR)), 1, 15)
        |        AS BIGINT) % 1000 <
        |      (CASE WHEN date_diff('day', DATE '2024-01-01', d) % 11 = 3
        |       THEN 400 ELSE 15 END) THEN 1 ELSE 0 END AS e
        |  FROM ev),
        |daily AS (SELECT d, COUNT(*) AS n, SUM(e) AS err FROM fl GROUP BY d),
        |ix AS (SELECT d, n, err,
        |    date_diff('day', (SELECT MIN(d) FROM daily), d) AS i FROM daily),
        |win AS (SELECT d, n, err,
        |    SUM(n) OVER w3 AS n3, SUM(err) OVER w3 AS e3,
        |    SUM(n) OVER w7 AS n7, SUM(err) OVER w7 AS e7
        |  FROM ix
        |  WINDOW w3 AS (ORDER BY i RANGE BETWEEN 2 PRECEDING AND CURRENT ROW),
        |         w7 AS (ORDER BY i RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT d, CAST(n AS BIGINT) AS n, CAST(err AS BIGINT) AS err,
        |  CAST(err * 500000 // n AS BIGINT) AS burn1_e4,
        |  CAST(e3 * 500000 // n3 AS BIGINT) AS burn3_e4,
        |  CAST(e7 * 500000 // n7 AS BIGINT) AS burn7_e4,
        |  CAST(CASE WHEN err * 500000 // n >= 100000
        |    AND e3 * 500000 // n3 >= 50000 THEN 1 ELSE 0 END AS BIGINT) AS page,
        |  CAST(CASE WHEN e3 * 500000 // n3 >= 20000
        |    AND e7 * 500000 // n7 >= 10000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS ticket
        |FROM win ORDER BY d""".stripMargin,

    "q432_gorilla_bits" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid,
        |    epoch_us(ts) // 1000000 AS t FROM events),
        |lag1 AS (SELECT u, us, eid, t,
        |    ROW_NUMBER() OVER w AS i,
        |    t - LAG(t) OVER w AS dt
        |  FROM ev WINDOW w AS (PARTITION BY u ORDER BY us, eid)),
        |lagd AS (SELECT *, dt - LAG(dt) OVER w AS dod
        |  FROM lag1 WINDOW w AS (PARTITION BY u ORDER BY us, eid)),
        |bits AS (SELECT *,
        |    CASE WHEN i = 1 THEN 64 WHEN i = 2 THEN 27
        |         WHEN dod = 0 THEN 1
        |         WHEN dod BETWEEN -63 AND 64 THEN 9
        |         WHEN dod BETWEEN -255 AND 256 THEN 12
        |         WHEN dod BETWEEN -2047 AND 2048 THEN 16
        |         ELSE 37 END AS b,
        |    CASE WHEN i = 1 THEN 64
        |         WHEN dt = 0 THEN 1
        |         WHEN dt BETWEEN -63 AND 64 THEN 9
        |         WHEN dt BETWEEN -255 AND 256 THEN 12
        |         WHEN dt BETWEEN -2047 AND 2048 THEN 16
        |         ELSE 37 END AS db
        |  FROM lagd)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_streams,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
        |  CAST(SUM(db) AS BIGINT) AS delta_bits,
        |  CAST(SUM(b) AS BIGINT) AS dod_bits,
        |  CAST(SUM(CASE WHEN i >= 3 AND dod = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dod_zero,
        |  CAST(SUM(CASE WHEN i >= 3 AND dod != 0 AND dod BETWEEN -63 AND 64
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dod_7b,
        |  CAST(SUM(CASE WHEN i >= 3 AND NOT dod BETWEEN -63 AND 64
        |    AND dod BETWEEN -255 AND 256 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dod_9b,
        |  CAST(SUM(CASE WHEN i >= 3 AND NOT dod BETWEEN -255 AND 256
        |    AND dod BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dod_12b,
        |  CAST(SUM(CASE WHEN i >= 3 AND NOT dod BETWEEN -2047 AND 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dod_32b,
        |  CAST(SUM(b) * 10000 // (COUNT(*) * 64) AS BIGINT) AS dod_ratio_e4,
        |  CAST(SUM(db) * 10000 // (COUNT(*) * 64) AS BIGINT) AS delta_ratio_e4
        |FROM bits""".stripMargin
    )
  }
}
