package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monitor-and-sampling wave (round 10, seventy-seventh wave):
  * Page–Hinkley sequential changepoint, the DKW confidence band,
  * and Vose's alias method.
  *
  * q462 completes the changepoint family (CUSUM q137, SPRT q436)
  * with the Page–Hinkley test over q431's incident-injected daily
  * error rates: m_t accumulates (x_t − μ₀ − δ), the alarm fires when
  * m_t − min m exceeds λ, and the detector RESETS after each alarm
  * so every injected incident is caught separately — alarm days
  * emitted as data, detection certified to land ON incident days.
  * q464 completes q457's sampling economics with the
  * Dvoretzky–Kiefer–Wolfowitz band: sup|F̂ − F| over the WHOLE CDF
  * is bounded by √(ln(2/δ)/2n) — the sup-deviation is computed
  * exactly on the distinct-value grain via one packed prefix sum
  * (population + sample cumulative in one BIGINT), and the 99 %
  * band event is observed against the fully known population CDF.
  * q465 builds Vose's alias table (1991) over the nation order-count
  * weights in EXACT integers (units of w·K against column capacity
  * W, conserved by construction since Σwᵢ·K = W·K): the
  * small/large pairing fold finalizes one column per step, and the
  * defining property — every weight reconstructs exactly from its
  * own cell plus the alias slack pointed at it — is certified
  * per nation with violations at zero.
  */
object AdvisorTwoQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G409: Page–Hinkley changepoint with reset ──────────────────────
    // x_t = daily error rate at e4 (q431's deterministic stream:
    // baseline ~1.5 %, every-11th-day incidents at ~40 %). μ₀ = 200,
    // δ = 100, λ = 2000 — design literals. After an alarm the
    // statistic resets, so the three injected incidents in a 30-day
    // window produce three separate alarms on exactly the incident
    // days.
    "q462_page_hinkley" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_id").as("eid"))
        .withColumn("e", expr(
          """case when pmod(md5_60(cast(eid as string)), 1000) <
            |  (case when pmod(datediff(d, to_date('2024-01-01')), 11) = 3
            |   then 400L else 15L end) then 1L else 0L end""".stripMargin))
        .groupBy("d").agg(count(lit(1)).as("n"), sum("e").as("err"))
        .withColumn("x", expr("err * 10000 div n"))
        .withColumn("inc", expr(
          "case when pmod(datediff(d, to_date('2024-01-01')), 11) = 3 " +
            "then 1L else 0L end"))
      val step = "(z.x - 200L - 100L)"
      val packed = daily
        .agg(expr("array_sort(collect_list(struct(d, x, inc)))").as("xs"),
          count(lit(1)).as("n_days"), sum("inc").as("n_incident_days"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('m', 0L, 'mn', 0L, 'al', 0L, 'hit', 0L,
             |               'maxph', 0L),
             |  (acc, z) -> case
             |    when acc.m + $step - least(acc.mn, acc.m + $step) > 2000L
             |    then named_struct('m', 0L, 'mn', 0L, 'al', acc.al + 1L,
             |      'hit', acc.hit + z.inc,
             |      'maxph', greatest(acc.maxph,
             |        acc.m + $step - least(acc.mn, acc.m + $step)))
             |    else named_struct('m', acc.m + $step,
             |      'mn', least(acc.mn, acc.m + $step), 'al', acc.al,
             |      'hit', acc.hit,
             |      'maxph', greatest(acc.maxph,
             |        acc.m + $step - least(acc.mn, acc.m + $step))) end)"""
            .stripMargin))
        .select(col("n_days"), col("n_incident_days"),
          expr("st.al").as("n_alarms"), expr("st.hit").as("n_alarms_on_incident"),
          expr("st.maxph").as("max_ph_e4"))
        .withColumn("all_alarms_on_incidents", expr(
          "case when n_alarms = n_alarms_on_incident then 1L else 0L end"))
      packed
    }),

    // ── G410: DKW confidence band, observed against the known CDF ──────
    "q464_dkw_band" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
        .withColumn("insamp", expr(
          "case when pmod(md5_60(cast(k as string)), 64) = 0 then 1L else 0L end"))
      val cells = o.groupBy("v")
        .agg(count(lit(1)).as("pc"), sum("insamp").as("sc"))
        .withColumn("pk", expr("pc + sc * 4294967296L"))
      val cum = graft.ops.Relational.prefixSum(cells, Seq(col("v")), "pk", "cumpk")
        .select(col("v"),
          expr("pmod(cumpk, 4294967296L)").as("cump"),
          expr("cumpk div 4294967296L").as("cums"))
      val tot = o.agg(count(lit(1)).as("nn"), sum("insamp").as("n"))
      cum.crossJoin(broadcast(tot))
        .agg(max("nn").as("nn"), max("n").as("n"),
          max(expr("abs(cums * nn - cump * n)")).as("dev_num"),
          count(lit(1)).as("n_values"))
        .withColumn("sup_dev_e6", expr(
          "cast(cast(dev_num as decimal(38, 0)) * 1000000 " +
            "div (cast(n as decimal(38, 0)) * nn) as bigint)"))
        // eps = sqrt(ln(2/delta)/(2n)) at e6; delta = 0.01
        .withColumn("eps_e6", expr(
          "cast(floor(sqrt(cast(5298317000000L div (2 * n) as double))) as bigint)"))
        .select(col("nn").as("n_pop"), col("n").as("n_sample"),
          col("n_values"), col("sup_dev_e6"), col("eps_e6"),
          expr("case when sup_dev_e6 <= eps_e6 then 1L else 0L end")
            .as("band_holds"))
    }),

    // ── G411: Vose's alias table in exact integers ─────────────────────
    // Units u_i = w_i·K against capacity W (= Σw); mass conserved
    // exactly, so smalls and larges always balance. Each step
    // finalizes the LOWEST unfinalized small against the LOWEST
    // unfinalized large (deterministic), or a full column against
    // itself. Reconstruction: w_i·K = cell_i.prob + Σ_{alias_j = i}
    // (W − cell_j.prob) — the alias-method invariant, counted.
    "q465_alias_table" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val w = Tables.orders(s, dir).select(col("o_custkey"))
        .join(c, "o_custkey").groupBy("g").agg(count(lit(1)).as("wt"))
      val tot = w.agg(sum("wt").as("bigw"), count(lit(1)).as("kk"))
      val sm = "filter(sequence(1, 25), i -> element_at(acc.fz, i) = 0L " +
        "and element_at(acc.u, i) < bigw)"
      val lg = "filter(sequence(1, 25), i -> element_at(acc.fz, i) = 0L " +
        "and element_at(acc.u, i) > bigw)"
      val anyU = "filter(sequence(1, 25), i -> element_at(acc.fz, i) = 0L)"
      val packed = w.orderBy("g")
        .agg(expr("transform(array_sort(collect_list(struct(g, wt))), z -> z.wt)")
          .as("ws"))
        .crossJoin(broadcast(tot))
        .withColumn("u0", expr("transform(ws, x -> x * kk)"))
        .withColumn("st", expr(
          s"""aggregate(sequence(1, 25),
             |  named_struct('u', u0,
             |    'fz', transform(sequence(1, 25), i -> 0L),
             |    'cp', transform(sequence(1, 25), i -> 0L),
             |    'ca', transform(sequence(1, 25), i -> 0L)),
             |  (acc, stp) -> case when size($sm) > 0 then named_struct(
             |      'u', transform(acc.u, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($lg, 1)
             |          then v - (bigw - element_at(acc.u, element_at($sm, 1)))
             |          else v end),
             |      'fz', transform(acc.fz, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($sm, 1)
             |          then 1L else v end),
             |      'cp', transform(acc.cp, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($sm, 1)
             |          then element_at(acc.u, element_at($sm, 1)) else v end),
             |      'ca', transform(acc.ca, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($sm, 1)
             |          then cast(element_at($lg, 1) as bigint) else v end))
             |    else named_struct(
             |      'u', acc.u,
             |      'fz', transform(acc.fz, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($anyU, 1)
             |          then 1L else v end),
             |      'cp', transform(acc.cp, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($anyU, 1)
             |          then bigw else v end),
             |      'ca', transform(acc.ca, (v, ix) ->
             |        case when cast(ix + 1 as int) = element_at($anyU, 1)
             |          then cast(element_at($anyU, 1) as bigint) else v end))
             |    end)""".stripMargin))
        .select(col("ws"), col("bigw"), col("kk"),
          expr("st.cp").as("cp"), expr("st.ca").as("ca"))
      packed.select(col("bigw"), col("kk"), col("cp"), col("ca"), col("ws"),
          posexplode(col("ws")).as(Seq("p0", "wt")))
        .select(expr("cast(p0 as bigint)").as("g"), col("wt"),
          expr("element_at(cp, p0 + 1)").as("cell_prob"),
          expr("element_at(ca, p0 + 1) - 1").as("cell_alias_g"),
          expr(
            """case when element_at(cp, p0 + 1)
              |  + aggregate(sequence(1, 25), 0L, (a, j) ->
              |      a + case when element_at(ca, j) = cast(p0 + 1 as bigint)
              |            and j != p0 + 1
              |        then bigw - element_at(cp, j) else 0L end)
              |  = wt * kk then 1L else 0L end""".stripMargin).as("recon_ok"))
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q462_page_hinkley" ->
      """WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS d,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
        |        1, 15) AS BIGINT) % 1000 <
        |      (CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         % 11 = 3 THEN 400 ELSE 15 END) THEN 1 ELSE 0 END) AS err
        |  FROM events GROUP BY 1),
        |seq AS (SELECT d, err * 10000 // n AS x,
        |    CASE WHEN date_diff('day', DATE '2024-01-01', d) % 11 = 3
        |      THEN 1 ELSE 0 END AS inc,
        |    ROW_NUMBER() OVER (ORDER BY d) AS i
        |  FROM daily),
        |nd AS (SELECT COUNT(*) AS n_days, SUM(inc) AS n_incident_days
        |       FROM seq),
        |rec AS (
        |  SELECT 0::BIGINT AS i, 0::BIGINT AS m, 0::BIGINT AS mn,
        |    0::BIGINT AS al, 0::BIGINT AS hit, 0::BIGINT AS maxph
        |  UNION ALL
        |  SELECT s.i,
        |    CASE WHEN r.m + (s.x - 300)
        |        - LEAST(r.mn, r.m + (s.x - 300)) > 2000
        |      THEN 0 ELSE r.m + (s.x - 300) END,
        |    CASE WHEN r.m + (s.x - 300)
        |        - LEAST(r.mn, r.m + (s.x - 300)) > 2000
        |      THEN 0 ELSE LEAST(r.mn, r.m + (s.x - 300)) END,
        |    r.al + CASE WHEN r.m + (s.x - 300)
        |        - LEAST(r.mn, r.m + (s.x - 300)) > 2000 THEN 1 ELSE 0 END,
        |    r.hit + CASE WHEN r.m + (s.x - 300)
        |        - LEAST(r.mn, r.m + (s.x - 300)) > 2000 THEN s.inc
        |      ELSE 0 END,
        |    GREATEST(r.maxph, r.m + (s.x - 300)
        |      - LEAST(r.mn, r.m + (s.x - 300)))
        |  FROM rec r JOIN seq s ON s.i = r.i + 1),
        |fin AS (SELECT r.* FROM rec r, nd WHERE r.i = nd.n_days)
        |SELECT CAST(nd.n_days AS BIGINT) AS n_days,
        |  CAST(nd.n_incident_days AS BIGINT) AS n_incident_days,
        |  CAST(fin.al AS BIGINT) AS n_alarms,
        |  CAST(fin.hit AS BIGINT) AS n_alarms_on_incident,
        |  CAST(fin.maxph AS BIGINT) AS max_ph_e4,
        |  CAST(CASE WHEN fin.al = fin.hit THEN 1 ELSE 0 END AS BIGINT)
        |    AS all_alarms_on_incidents
        |FROM fin, nd""".stripMargin,

    "q464_dkw_band" ->
      """WITH o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 64 = 0 THEN 1 ELSE 0 END AS insamp
        |  FROM orders),
        |cells AS (SELECT v, COUNT(*) AS pc, SUM(insamp) AS sc
        |          FROM o GROUP BY v),
        |cum AS (SELECT v,
        |    SUM(pc) OVER w AS cump, SUM(sc) OVER w AS cums
        |  FROM cells WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT COUNT(*) AS nn, SUM(insamp) AS n FROM o),
        |agg AS (SELECT MAX(ABS(cums * nn - cump * n)) AS dev_num,
        |    COUNT(*) AS n_values FROM cum, tot)
        |SELECT CAST(tot.nn AS BIGINT) AS n_pop,
        |  CAST(tot.n AS BIGINT) AS n_sample,
        |  CAST(agg.n_values AS BIGINT) AS n_values,
        |  CAST(CAST(agg.dev_num AS HUGEINT) * 1000000
        |    // (CAST(tot.n AS HUGEINT) * tot.nn) AS BIGINT) AS sup_dev_e6,
        |  CAST(FLOOR(SQRT(CAST(5298317000000 // (2 * tot.n) AS DOUBLE)))
        |    AS BIGINT) AS eps_e6,
        |  CAST(CASE WHEN CAST(agg.dev_num AS HUGEINT) * 1000000
        |      // (CAST(tot.n AS HUGEINT) * tot.nn)
        |    <= CAST(FLOOR(SQRT(CAST(5298317000000 // (2 * tot.n) AS DOUBLE)))
        |      AS BIGINT) THEN 1 ELSE 0 END AS BIGINT) AS band_holds
        |FROM tot, agg""".stripMargin,

    "q465_alias_table" ->
      """WITH RECURSIVE w AS (SELECT c.c_nationkey AS g, COUNT(*) AS wt
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT SUM(wt) AS bigw, COUNT(*) AS kk FROM w),
        |ws AS (SELECT list_transform(list_sort(list(struct_pack(
        |    g := g, wt := wt))), z -> z.wt) AS ws FROM w),
        |it AS (
        |  SELECT 0::BIGINT AS stp,
        |    list_transform(ws.ws, x -> x * tot.kk) AS u,
        |    list_transform(range(1, 26), i -> 0::BIGINT) AS fz,
        |    list_transform(range(1, 26), i -> 0::BIGINT) AS cp,
        |    list_transform(range(1, 26), i -> 0::BIGINT) AS ca
        |  FROM ws, tot
        |  UNION ALL
        |  SELECT stp + 1,
        |    CASE WHEN len(list_filter(range(1, 26), i -> it.fz[i] = 0
        |        AND it.u[i] < tot.bigw)) > 0
        |      THEN list_transform(it.u, (v, ix) ->
        |        CASE WHEN ix = list_filter(range(1, 26), i -> it.fz[i] = 0
        |            AND it.u[i] > tot.bigw)[1]
        |          THEN v - (tot.bigw - it.u[list_filter(range(1, 26),
        |            i -> it.fz[i] = 0 AND it.u[i] < tot.bigw)[1]])
        |          ELSE v END)
        |      ELSE it.u END,
        |    list_transform(it.fz, (v, ix) ->
        |      CASE WHEN ix = COALESCE(list_filter(range(1, 26),
        |          i -> it.fz[i] = 0 AND it.u[i] < tot.bigw)[1],
        |          list_filter(range(1, 26), i -> it.fz[i] = 0)[1])
        |        THEN 1 ELSE v END),
        |    list_transform(it.cp, (v, ix) ->
        |      CASE WHEN len(list_filter(range(1, 26), i -> it.fz[i] = 0
        |            AND it.u[i] < tot.bigw)) > 0
        |        THEN (CASE WHEN ix = list_filter(range(1, 26),
        |            i -> it.fz[i] = 0 AND it.u[i] < tot.bigw)[1]
        |          THEN it.u[ix] ELSE v END)
        |        ELSE (CASE WHEN ix = list_filter(range(1, 26),
        |            i -> it.fz[i] = 0)[1] THEN tot.bigw ELSE v END) END),
        |    list_transform(it.ca, (v, ix) ->
        |      CASE WHEN len(list_filter(range(1, 26), i -> it.fz[i] = 0
        |            AND it.u[i] < tot.bigw)) > 0
        |        THEN (CASE WHEN ix = list_filter(range(1, 26),
        |            i -> it.fz[i] = 0 AND it.u[i] < tot.bigw)[1]
        |          THEN CAST(list_filter(range(1, 26), i -> it.fz[i] = 0
        |            AND it.u[i] > tot.bigw)[1] AS BIGINT) ELSE v END)
        |        ELSE (CASE WHEN ix = list_filter(range(1, 26),
        |            i -> it.fz[i] = 0)[1]
        |          THEN CAST(list_filter(range(1, 26), i -> it.fz[i] = 0)[1]
        |            AS BIGINT) ELSE v END) END)
        |  FROM it, tot WHERE stp < 25),
        |fin AS (SELECT cp, ca FROM it WHERE stp = 25),
        |gr AS (SELECT UNNEST(range(1, 26)) AS gi)
        |SELECT CAST(gr.gi - 1 AS BIGINT) AS g,
        |  CAST(ws.ws[CAST(gr.gi AS INT)] AS BIGINT) AS wt,
        |  CAST(fin.cp[CAST(gr.gi AS INT)] AS BIGINT) AS cell_prob,
        |  CAST(fin.ca[CAST(gr.gi AS INT)] - 1 AS BIGINT) AS cell_alias_g,
        |  CAST(CASE WHEN fin.cp[CAST(gr.gi AS INT)]
        |    + (SELECT COALESCE(SUM(tot.bigw - fin.cp[CAST(j.ji AS INT)]), 0)
        |       FROM (SELECT UNNEST(range(1, 26)) AS ji) j
        |       WHERE fin.ca[CAST(j.ji AS INT)] = gr.gi AND j.ji != gr.gi)
        |    = ws.ws[CAST(gr.gi AS INT)] * tot.kk THEN 1 ELSE 0 END AS BIGINT)
        |    AS recon_ok
        |FROM gr, fin, ws, tot
        |ORDER BY g""".stripMargin
  )
}
