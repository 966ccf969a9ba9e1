package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stewardship and attribution operators (round 9, seventeenth wave):
  * pseudonymization integrity, per-user contribution capping, exact
  * 3-channel Shapley attribution, and rolling regression.
  *
  * Reference intent: the reference stores raw store ids and attributes
  * nothing (services/airflow/dags/db_utils.py); a production 100-TB
  * event pipeline tokenizes identities before analytics, bounds any
  * single user's influence before releasing aggregates, and settles
  * the "which channel gets credit" fight with game-theoretically fair
  * shares — all pure relational plans with scaled-integer exactness.
  */
object TrustQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G185: pseudonymization integrity audit ─────────────────────────
    // Deterministic tokenization (keyed md5-16 of the user id) is only
    // safe if it stays injective on the id domain and keeps resolving
    // across independently tokenized tables. The audit: token NDV vs
    // id NDV (collision census — 16 hex chars ⇒ birthday-bound
    // ≈ n²/2⁶⁵, but PROVE it on this corpus), plus coverage of the
    // tokenized fact against a SEPARATELY tokenized dimension (here:
    // purchasing users) — n_outside_dim counts fact rows whose token
    // resolves to no dimension row, the number a join-integrity
    // monitor alerts on after a salt rotation goes wrong on one side.
    // One corpus aggregate + one broadcast anti-join on tokens; the
    // salt is a key-management secret at production — a literal here,
    // same plan.
    "q240_pseudonymize" -> ((s, dir) => {
      val tok = expr("substring(md5(concat('salt-v1|', cast(user_id as string))), 1, 16)")
      val ev = Tables.events(s, dir).withColumn("token", tok)
      val dim = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("user_id").distinct()
        .withColumn("token", tok)
        .select("token")
      val outside = ev.join(broadcast(dim), Seq("token"), "left_anti")
      ev.agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("token")).as("n_tokens"))
        .withColumn("n_collisions", expr("n_users - n_tokens"))
        .crossJoin(outside.agg(count(lit(1)).as("n_outside_dim")))
    }),

    // ── G186: contribution capping (bounded user influence) ────────────
    // The differential-privacy prerequisite and the robustness fix for
    // whale users: keep at most k=20 events per user (earliest first —
    // deterministic (ts, event_id) order), then compare the per-type
    // value aggregate against the uncapped one. retained_e4 tells the
    // analyst how much signal the bound costs; at 100 TB the window is
    // one user-partitioned rank — the same exchange every per-user
    // operator shares.
    "q241_contribution_cap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("rk", row_number().over(w))
        .withColumn("v6", expr("cast(round(value * 1000000) as bigint)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("rk") <= 20, 1L).otherwise(0L)).as("n_capped"),
          sum("v6").as("v6_raw"),
          sum(when(col("rk") <= 20, col("v6")).otherwise(0L)).as("v6_capped"))
        .withColumn("retained_e4", expr("n_capped * 10000 div n_raw"))
        .orderBy("event_type")
    }),

    // ── G187: exact Shapley attribution (3 marketing channels) ─────────
    // Last-touch (q100) and position (q153) are heuristics; the Shapley
    // value is the unique fair split. With 3 channels (click, view,
    // signup) it is EXACT and integer: per converted user the touched-
    // channel pattern (≤8 classes, one corpus aggregate); coalition
    // value v(S) = converted users whose pattern ⊆ S (8×8 broadcast
    // subset join); φ_c·6 = 2·(v(c)−v(∅)) + (v(c∪a)−v(a)) +
    // (v(c∪b)−v(b)) + 2·(v(N)−v(N∖c)) — sixths-scaled weights keep
    // everything BIGINT. Efficiency check φ_click+φ_view+φ_signup =
    // v(N)−v(∅) is emitted as data (and spec-asserted). Everything
    // after the first aggregate is 8-row arithmetic — free at any
    // corpus size.
    "q242_shapley_attribution" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
          max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("g"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .filter(col("conv") === 1L)
      val pat = perUser.groupBy("c", "v", "g").agg(count(lit(1)).as("n"))
        .withColumn("pbits", expr("c * 4 + v * 2 + g"))
      val sTab = s.range(0, 8).select(col("id").as("sbits"))
      val vOfS = sTab.join(pat,
          expr("(pbits & sbits) = pbits"), "left")
        .groupBy("sbits").agg(coalesce(sum("n"), lit(0L)).as("vs"))
      val vCols = (0 until 8).map(i =>
        sum(when(col("sbits") === i.toLong, col("vs"))).as(s"v$i"))
      val wide = vOfS.agg(vCols.head, vCols.tail: _*)
      // channel bits: click=4, view=2, signup=1
      wide
        .withColumn("phi6_click",
          expr("2*(v4 - v0) + (v6 - v2) + (v5 - v1) + 2*(v7 - v3)"))
        .withColumn("phi6_view",
          expr("2*(v2 - v0) + (v6 - v4) + (v3 - v1) + 2*(v7 - v5)"))
        .withColumn("phi6_signup",
          expr("2*(v1 - v0) + (v5 - v4) + (v3 - v2) + 2*(v7 - v6)"))
        .withColumn("organic", col("v0"))
        .withColumn("converted_total", col("v7"))
        .select("phi6_click", "phi6_view", "phi6_signup", "organic", "converted_total")
    }),

    // ── G188: rolling regression (trailing 14-cell trend per key) ──────
    // q154 fits ONE slope per key; operations wants the trend AS OF
    // each day. All five OLS moments are plain window sums over the
    // trailing 14 daily cells, so the rolling fit rides ONE
    // (type, day)-sorted exchange — no self-join, no per-day refit;
    // the q154 sign-explicit DECIMAL floor makes each day's slope
    // bit-exact. Emitted from the 14th cell on (full windows only).
    "q243_rolling_regression" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
        .withColumn("x", expr("datediff(day, date '1970-01-01')").cast(LongType))
      val w = Window.partitionBy("event_type").orderBy("x").rowsBetween(-13, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum("x").over(w))
        .withColumn("sy", sum("y6").over(w))
        .withColumn("sxx", sum(expr("x * x")).over(w))
        .withColumn("sxy", sum(expr("x * y6")).over(w))
        .filter(col("n") === 14)
        .withColumn("num", expr(s"cast(n as $dec) * sxy - cast(sx as $dec) * sy"))
        .withColumn("den", expr(s"cast(n as $dec) * sxx - cast(sx as $dec) * sx"))
        .withColumn("slope6", expr(
          "cast(case when num < 0 then -(abs(num) div den) else num div den end as bigint)"))
        .select("event_type", "day", "y6", "slope6")
        .orderBy("event_type", "day")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q240_pseudonymize" ->
      """WITH ev AS (SELECT user_id,
        |              substr(md5('salt-v1|' || CAST(user_id AS VARCHAR)), 1, 16) AS token
        |            FROM events),
        |a AS (SELECT COUNT(*) AS n_events,
        |        COUNT(DISTINCT user_id) AS n_users,
        |        COUNT(DISTINCT token) AS n_tokens
        |      FROM ev),
        |dim AS (SELECT DISTINCT substr(md5('salt-v1|' || CAST(user_id AS VARCHAR)), 1, 16)
        |          AS token
        |        FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT COUNT(*) AS n_outside_dim FROM ev
        |      WHERE token NOT IN (SELECT token FROM dim))
        |SELECT CAST(n_events AS BIGINT) AS n_events,
        |       CAST(n_users AS BIGINT) AS n_users,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_users - n_tokens AS BIGINT) AS n_collisions,
        |       CAST(o.n_outside_dim AS BIGINT) AS n_outside_dim
        |FROM a, o""".stripMargin,

    "q241_contribution_cap" ->
      """WITH r AS (SELECT event_type,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS rk
        |           FROM events)
        |SELECT event_type, COUNT(*) AS n_raw,
        |       CAST(SUM(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |       CAST(SUM(v6) AS BIGINT) AS v6_raw,
        |       CAST(SUM(CASE WHEN rk <= 20 THEN v6 ELSE 0 END) AS BIGINT) AS v6_capped,
        |       CAST(SUM(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |         AS BIGINT) AS retained_e4
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q242_shapley_attribution" ->
      """WITH pu AS (SELECT user_id,
        |              MAX(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END) AS c,
        |              MAX(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END) AS v,
        |              MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS g,
        |              MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |            FROM events GROUP BY user_id),
        |pat AS (SELECT c * 4 + v * 2 + g AS pbits, COUNT(*) AS n
        |        FROM pu WHERE conv = 1 GROUP BY 1),
        |ss AS (SELECT UNNEST(range(0, 8)) AS sbits),
        |vs AS (SELECT ss.sbits, COALESCE(SUM(pat.n), 0) AS vs
        |       FROM ss LEFT JOIN pat ON (pat.pbits & ss.sbits) = pat.pbits
        |       GROUP BY ss.sbits),
        |wide AS (SELECT
        |    MAX(CASE WHEN sbits = 0 THEN vs END) AS v0,
        |    MAX(CASE WHEN sbits = 1 THEN vs END) AS v1,
        |    MAX(CASE WHEN sbits = 2 THEN vs END) AS v2,
        |    MAX(CASE WHEN sbits = 3 THEN vs END) AS v3,
        |    MAX(CASE WHEN sbits = 4 THEN vs END) AS v4,
        |    MAX(CASE WHEN sbits = 5 THEN vs END) AS v5,
        |    MAX(CASE WHEN sbits = 6 THEN vs END) AS v6,
        |    MAX(CASE WHEN sbits = 7 THEN vs END) AS v7
        |  FROM vs)
        |SELECT CAST(2*(v4 - v0) + (v6 - v2) + (v5 - v1) + 2*(v7 - v3) AS BIGINT)
        |         AS phi6_click,
        |       CAST(2*(v2 - v0) + (v6 - v4) + (v3 - v1) + 2*(v7 - v5) AS BIGINT)
        |         AS phi6_view,
        |       CAST(2*(v1 - v0) + (v5 - v4) + (v3 - v2) + 2*(v7 - v6) AS BIGINT)
        |         AS phi6_signup,
        |       CAST(v0 AS BIGINT) AS organic,
        |       CAST(v7 AS BIGINT) AS converted_total
        |FROM wide""".stripMargin,

    "q243_rolling_regression" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 SUM(CAST(round(value * 1000000) AS BIGINT)) AS y6
        |               FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, day, y6,
        |        CAST(day - DATE '1970-01-01' AS BIGINT) AS x FROM daily),
        |m AS (SELECT event_type, day, y6,
        |        COUNT(*) OVER w AS n,
        |        SUM(x) OVER w AS sx, SUM(y6) OVER w AS sy,
        |        SUM(x * x) OVER w AS sxx, SUM(x * y6) OVER w AS sxy
        |      FROM x
        |      WINDOW w AS (PARTITION BY event_type ORDER BY x
        |                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT event_type, day, y6,
        |        CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
        |      FROM m WHERE n = 14)
        |SELECT event_type, day, CAST(y6 AS BIGINT) AS y6,
        |       CAST(CASE WHEN num < 0 THEN -(ABS(num) // den)
        |                 ELSE num // den END AS BIGINT) AS slope6
        |FROM f ORDER BY event_type, day""".stripMargin
  )
}
