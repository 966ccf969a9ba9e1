package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guardrail layer (round 10, fifty-ninth wave): token-bucket
  * admission, quantile-forecast calibration (pinball loss),
  * t-closeness privacy, and Chao1 species richness.
  *
  * Reference intent: the reference fronts its API with nginx
  * (services/nginx/nginx.conf) but applies no rate limiting, serves
  * point forecasts with no quantile calibration, and publishes
  * per-store aggregates with no privacy audit. q409 is the rate
  * limiter done as data — an exact integer token bucket (capacity 3,
  * one token per 12 h) folded per user in event order, the greedy
  * stateful primitive every ingestion edge runs. q410 scores a
  * trailing-28-day empirical-quantile forecast with the pinball loss
  * — the proper scoring rule for quantiles — plus realized coverage,
  * the calibration pair (Koenker & Bassett 1978). q411 is t-closeness
  * (Li et al., ICDE 2007): ordered EMD between each nation's
  * order-priority distribution and the global one, cross-multiplied
  * so no probability ever materializes. q412 is Chao1 richness
  * (Chao 1984) with the honest scoreboard q403 set: estimate the
  * total trigram vocabulary from an 80 % sample, measure against the
  * full corpus.
  */
object GuardrailQueries {

  private val P = 43200000000L // 12 h refill period, micros
  private val B = 3L           // bucket capacity

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G354: token-bucket admission fold ──────────────────────────────
    // Per user, events in (us, eid) order. State (t, anc): on arrival,
    // t₁ = min(t + (us−anc) div P, B); the anchor advances by whole
    // periods only — anc' = anc + ((us−anc) div P)·P, reset to us when
    // the bucket clamps full — so no refill remainder is ever lost or
    // double-counted. Admit iff t₁ ≥ 1 (then t₁−1 carries). The fold
    // is an aggregate HOF over the sorted per-user array with every
    // subexpression inlined (SQL lambdas bind no locals, q361).
    // Admitted events are xor-receipted; the oracle replays the
    // identical recurrence as a RECURSIVE CTE over per-user ranks.
    "q409_token_bucket" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
      val t1 = s"(case when acc.anc = -1L then ${B}L" +
        s" else least(acc.t + (z.us - acc.anc) div ${P}L, ${B}L) end)"
      val ancN = s"(case when acc.anc = -1L then z.us" +
        s" when acc.t + (z.us - acc.anc) div ${P}L >= ${B}L then z.us" +
        s" else acc.anc + ((z.us - acc.anc) div ${P}L) * ${P}L end)"
      val adm = s"($t1 >= 1L)"
      val perUser = ev.groupBy("u")
        .agg(expr("array_sort(collect_list(struct(us, eid)))").as("xs"),
          count(lit(1)).as("n_u"))
        .withColumn("st", expr(
          s"""aggregate(xs, named_struct('t', 0L, 'anc', -1L, 'adm', 0L, 'xr', 0L),
             |  (acc, z) -> named_struct(
             |    't', $t1 - (case when $adm then 1L else 0L end),
             |    'anc', $ancN,
             |    'adm', acc.adm + (case when $adm then 1L else 0L end),
             |    'xr', case when $adm
             |          then acc.xr ^ md5_60(concat(cast(u as string), ':',
             |               cast(z.us as string), ':', cast(z.eid as string)))
             |          else acc.xr end))""".stripMargin))
        .select(col("u"), col("n_u"), expr("st.adm").as("adm"),
          expr("st.xr").as("xr"))
      perUser.agg(
          sum("n_u").as("n"), sum("adm").as("n_admitted"),
          sum(expr("n_u - adm")).as("n_denied"),
          expr("bit_xor(xr)").as("xor60_admitted"),
          max(expr("n_u - adm")).as("max_user_denied"))
        .withColumn("admit_e4", expr("n_admitted * 10000 div n"))
        .select("n", "n_admitted", "n_denied", "admit_e4",
          "xor60_admitted", "max_user_denied")
    }),

    // ── G355: pinball-loss quantile-forecast calibration ───────────────
    // Per order priority, daily order counts on a dense zero-filled
    // spine (q357). Forecast for day i at quantile q: the q-th
    // discrete quantile (index ⌈q·28⌉, 1-based) of the trailing 28
    // days — a ROWS window per priority, never global. Scored days
    // need full history (i ≥ 28). Pinball loss at q (e2):
    // max(q·(y−f), (q−100)·(y−f)) — positive iff miss, asymmetric by
    // design; realized coverage (share of days y ≤ f) is the
    // calibration check: a calibrated q90 forecast covers ~90 %.
    "q410_pinball_loss" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("pri"),
          to_date(col("o_orderdate")).as("d"))
      val span = o.agg(min("d").as("d0"), max("d").as("d1"))
      val spine = o.select("pri").distinct().crossJoin(broadcast(span))
        .select(col("pri"), explode(expr("sequence(d0, d1)")).as("d"), col("d0"))
      val daily = spine
        .join(o.groupBy("pri", "d").agg(count(lit(1)).as("y0")), Seq("pri", "d"), "left")
        .select(col("pri"), datediff(col("d"), col("d0")).cast("long").as("i"),
          coalesce(col("y0"), lit(0L)).as("y"))
      val w = Window.partitionBy("pri").orderBy("i").rowsBetween(-28, -1)
      val scored = daily
        .withColumn("hist", array_sort(collect_list(col("y")).over(w)))
        .filter(col("i") >= 28)
        .select(col("pri"), col("y"),
          explode(expr(
            """array(
              |  named_struct('q_e2', 10L,  'f', element_at(hist, 3)),
              |  named_struct('q_e2', 50L,  'f', element_at(hist, 14)),
              |  named_struct('q_e2', 90L,  'f', element_at(hist, 26)))"""
              .stripMargin)).as("z"))
        .select(col("pri"), expr("z.q_e2").as("q_e2"), col("y"), expr("z.f").as("f"))
      scored.groupBy("pri", "q_e2")
        .agg(count(lit(1)).as("n_scored"),
          sum(expr("greatest(q_e2 * (y - f), (q_e2 - 100) * (y - f))"))
            .as("pinball_sum_e2"),
          sum(when(col("y") <= col("f"), 1L).otherwise(0L)).as("n_covered"))
        .withColumn("mean_pinball_e2", expr("pinball_sum_e2 div n_scored"))
        .withColumn("coverage_e4", expr("n_covered * 10000 div n_scored"))
        .select("pri", "q_e2", "n_scored", "pinball_sum_e2",
          "mean_pinball_e2", "coverage_e4")
        .orderBy("pri", "q_e2")
    }),

    // ── G356: t-closeness audit (ordered EMD per quasi-id group) ───────
    // Quasi-id: customer nation (orders ⋈ customer). Sensitive:
    // order priority, ordered 1..5 by its digit prefix. Ordered EMD =
    // (1/(m−1)) Σ_k |cumP_g(k) − cumP(k)|, evaluated cross-multiplied:
    // |cum_g(k)·N − cum(k)·n_g| summed over k=1..4, then one e6
    // division by n_g·N·4 — no probability ever materializes, exact
    // BIGINT through sf0.1 (DECIMAL lift documented for 10⁹ rows).
    // Zero-filled (group × priority) spine; cum via a 4-element
    // triangular self-join on the 125-row grain — no window needed.
    "q411_t_closeness" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("p"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val rows = o.join(c, "o_custkey").select("g", "p")
      val grp = rows.groupBy("g", "p").agg(count(lit(1)).as("cgp"))
      val spine = rows.select("g").distinct()
        .crossJoin(broadcast(rows.select("p").distinct()))
      val cell = spine.join(grp, Seq("g", "p"), "left")
        .select(col("g"), col("p"), coalesce(col("cgp"), lit(0L)).as("cgp"))
      val glob = rows.groupBy("p").agg(count(lit(1)).as("cp"))
      val ng = rows.groupBy("g").agg(count(lit(1)).as("n_g"))
      val nTot = rows.agg(count(lit(1)).as("n"))
      // cum over the 5-value ordered domain: triangular join on the
      // (g, k) grain — k ranges 1..4 (the k=5 term is identically 0)
      val cum = cell.join(broadcast(glob), "p")
        .crossJoin(broadcast(nTot))
        .select(col("g"), col("p"), col("cgp"), col("cp"), col("n"))
        .join(broadcast(rows.select(col("p").as("k")).distinct()
          .filter(col("k") <= 4)), col("p") <= col("k"))
        .groupBy("g", "k")
        .agg(sum("cgp").as("cum_g"), sum("cp").as("cum"), max("n").as("n"))
      cum.join(broadcast(ng), "g")
        .withColumn("term", expr("abs(cum_g * n - cum * n_g)"))
        .groupBy("g")
        .agg(max("n_g").as("n_g"), max("n").as("n"), sum("term").as("ts"))
        .withColumn("emd_e6", expr("ts * 1000000 div (n_g * n * 4)"))
        .withColumn("breach", expr(
          "case when emd_e6 > 150000 then 1L else 0L end"))
        .select("g", "n_g", "emd_e6", "breach")
        .orderBy("g")
    }),

    // ── G357: Chao1 richness estimate vs full-corpus truth ─────────────
    // Trigram grain (q403's — the unigram vocabulary is closed).
    // TRAIN = 80 % of docs by md5(doc_id). Chao1 (bias-corrected):
    // S_obs + N₁(N₁−1) div (2(N₂+1)); Good's sample coverage
    // 1 − N₁/n. Truth: distinct trigrams over the FULL corpus —
    // the estimator is graded, not trusted. Signed error at e4.
    "q412_chao1_richness" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val tri = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))")).as("g"))
        .withColumn("held", expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) % 10 >= 8"))
      val train = tri.filter(!col("held")).groupBy("g").agg(count(lit(1)).as("r"))
      val ladder = train.agg(
        count(lit(1)).as("s_obs"),
        sum("r").as("n_occ"),
        sum(when(col("r") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("r") === 2, 1L).otherwise(0L)).as("n2"))
      val truth = tri.select("g").distinct().agg(count(lit(1)).as("s_true"))
      ladder.crossJoin(broadcast(truth))
        .withColumn("chao1", expr("s_obs + n1 * (n1 - 1) div (2 * (n2 + 1))"))
        .withColumn("err_e4", expr("(chao1 - s_true) * 10000 div s_true"))
        .withColumn("good_coverage_e4", expr("10000 - n1 * 10000 div n_occ"))
        .select("s_obs", "n1", "n2", "n_occ", "chao1", "s_true",
          "err_e4", "good_coverage_e4")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q409_token_bucket" ->
      s"""WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid FROM events),
        |seq AS (SELECT u, us, eid,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |nu AS (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, i, us, ${B - 1} AS t, us AS anc, 1::BIGINT AS adm,
        |    CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |      CAST(us AS VARCHAR) || ':' || CAST(eid AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS xr
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.u, s.i, s.us,
        |    LEAST(r.t + (s.us - r.anc) // $P, $B)
        |      - CASE WHEN LEAST(r.t + (s.us - r.anc) // $P, $B) >= 1
        |             THEN 1 ELSE 0 END,
        |    CASE WHEN r.t + (s.us - r.anc) // $P >= $B THEN s.us
        |         ELSE r.anc + ((s.us - r.anc) // $P) * $P END,
        |    r.adm + CASE WHEN LEAST(r.t + (s.us - r.anc) // $P, $B) >= 1
        |                 THEN 1 ELSE 0 END,
        |    CASE WHEN LEAST(r.t + (s.us - r.anc) // $P, $B) >= 1
        |         THEN xor(r.xr, CAST('0x' || substr(md5(CAST(s.u AS VARCHAR)
        |           || ':' || CAST(s.us AS VARCHAR) || ':' ||
        |           CAST(s.eid AS VARCHAR)), 1, 15) AS BIGINT))
        |         ELSE r.xr END
        |  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1),
        |fin AS (SELECT rec.u, rec.adm, rec.xr, nu.n_u
        |        FROM rec JOIN nu ON rec.u = nu.u WHERE rec.i = nu.n_u)
        |SELECT CAST(SUM(n_u) AS BIGINT) AS n,
        |  CAST(SUM(adm) AS BIGINT) AS n_admitted,
        |  CAST(SUM(n_u - adm) AS BIGINT) AS n_denied,
        |  CAST(SUM(adm) * 10000 // SUM(n_u) AS BIGINT) AS admit_e4,
        |  bit_xor(xr) AS xor60_admitted,
        |  CAST(MAX(n_u - adm) AS BIGINT) AS max_user_denied
        |FROM fin""".stripMargin,

    "q410_pinball_loss" ->
      """WITH o AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS d FROM orders),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM o),
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
        |sc AS (
        |  SELECT pri, 10::BIGINT AS q_e2, y, h[3] AS f FROM hist WHERE i >= 28
        |  UNION ALL
        |  SELECT pri, 50::BIGINT, y, h[14] FROM hist WHERE i >= 28
        |  UNION ALL
        |  SELECT pri, 90::BIGINT, y, h[26] FROM hist WHERE i >= 28)
        |SELECT pri, q_e2, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  CAST(SUM(GREATEST(q_e2 * (y - f), (q_e2 - 100) * (y - f)))
        |    AS BIGINT) AS pinball_sum_e2,
        |  CAST(SUM(GREATEST(q_e2 * (y - f), (q_e2 - 100) * (y - f)))
        |    // COUNT(*) AS BIGINT) AS mean_pinball_e2,
        |  CAST(SUM(CASE WHEN y <= f THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    AS BIGINT) AS coverage_e4
        |FROM sc GROUP BY pri, q_e2 ORDER BY pri, q_e2""".stripMargin,

    "q411_t_closeness" ->
      """WITH rows0 AS (SELECT c.c_nationkey AS g,
        |    CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS p
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |grp AS (SELECT g, p, COUNT(*) AS cgp FROM rows0 GROUP BY g, p),
        |spine AS (SELECT g, p FROM (SELECT DISTINCT g FROM rows0) a,
        |    (SELECT DISTINCT p FROM rows0) b),
        |cell AS (SELECT s.g, s.p, COALESCE(grp.cgp, 0) AS cgp
        |  FROM spine s LEFT JOIN grp ON s.g = grp.g AND s.p = grp.p),
        |gl AS (SELECT p, COUNT(*) AS cp FROM rows0 GROUP BY p),
        |ng AS (SELECT g, COUNT(*) AS n_g FROM rows0 GROUP BY g),
        |nt AS (SELECT COUNT(*) AS n FROM rows0),
        |ks AS (SELECT DISTINCT p AS k FROM rows0 WHERE p <= 4),
        |cum AS (SELECT cell.g, ks.k, SUM(cell.cgp) AS cum_g,
        |    SUM(gl.cp) AS cum, MAX(nt.n) AS n
        |  FROM cell JOIN gl ON cell.p = gl.p
        |    JOIN ks ON cell.p <= ks.k, nt
        |  GROUP BY cell.g, ks.k)
        |SELECT cum.g, CAST(MAX(ng.n_g) AS BIGINT) AS n_g,
        |  CAST(SUM(ABS(cum_g * n - cum * n_g)) * 1000000
        |    // (MAX(ng.n_g) * MAX(n) * 4) AS BIGINT) AS emd_e6,
        |  CAST(CASE WHEN SUM(ABS(cum_g * n - cum * n_g)) * 1000000
        |    // (MAX(ng.n_g) * MAX(n) * 4) > 150000 THEN 1 ELSE 0 END
        |    AS BIGINT) AS breach
        |FROM cum JOIN ng ON cum.g = ng.g
        |GROUP BY cum.g ORDER BY cum.g""".stripMargin,

    "q412_chao1_richness" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |tri AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ts) - 1),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |      % 10 >= 8 AS held
        |  FROM t WHERE len(ts) >= 3),
        |train AS (SELECT g, COUNT(*) AS r FROM tri WHERE NOT held GROUP BY g),
        |lad AS (SELECT COUNT(*) AS s_obs, SUM(r) AS n_occ,
        |    SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS n2 FROM train),
        |tr AS (SELECT COUNT(DISTINCT g) AS s_true FROM tri)
        |SELECT CAST(s_obs AS BIGINT) AS s_obs, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n2 AS BIGINT) AS n2, CAST(n_occ AS BIGINT) AS n_occ,
        |  CAST(s_obs + n1 * (n1 - 1) // (2 * (n2 + 1)) AS BIGINT) AS chao1,
        |  CAST(s_true AS BIGINT) AS s_true,
        |  CAST((s_obs + n1 * (n1 - 1) // (2 * (n2 + 1)) - s_true) * 10000
        |    // s_true AS BIGINT) AS err_e4,
        |  CAST(10000 - n1 * 10000 // n_occ AS BIGINT) AS good_coverage_e4
        |FROM lad, tr""".stripMargin
  )
}
