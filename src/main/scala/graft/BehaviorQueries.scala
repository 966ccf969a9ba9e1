package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Behavioral analytics over the event stream: cohort retention, ordered
  * funnels, and last-touch attribution — the product-analytics query
  * family the reference's Streamlit UI approximates with driver-side
  * pandas loops (services/web-ui/app/main.py renders raw rows and lets
  * the human eyeball trends). Each is one declarative plan keyed on
  * user_id: the per-user state (first week, stage timestamps, last
  * preceding click) comes from aggregates and windows, never a
  * driver-side loop. Week arithmetic is pure integer day-index math —
  * no engine-specific week-start semantics.
  */
object BehaviorQueries {

  /** Day-zero anchor for integer week indexing (testdata spans Jan 2024;
    * at scale this is the product launch date — any fixed anchor works,
    * the offsets are invariant to it). */
  private val Anchor = "2024-01-01"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G42: cohort retention ──────────────────────────────────────────
    // Users bucketed by first-activity week; retention = distinct users
    // active k weeks later. Two aggregates on user_id (the second reuses
    // the first's partitioning) + a user-keyed join — no window over the
    // whole corpus, no driver pivot. Weeks are integer day-index div 7:
    // identical arithmetic in any engine, no week-start convention.
    "q98_cohort_retention" -> ((s, dir) => {
      val uw = Tables.events(s, dir)
        .select(col("user_id"),
          expr(s"datediff(cast(ts as date), date'$Anchor') div 7")
            .cast(LongType).as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      uw.join(cohort, "user_id")
        .withColumn("week_offset", col("wk") - col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ── G43: strictly-ordered funnel ───────────────────────────────────
    // view → click-after-view → purchase-after-that-click, each stage's
    // entry being the user's EARLIEST qualifying event (min-aggregate,
    // then a user-keyed join feeding the next stage — at scale all three
    // reuse one hash partitioning on user_id). Single-row manifest with
    // exact integer conversion rates.
    "q99_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("vt"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("vt"))
        .groupBy("user_id").agg(min(col("ts")).as("ct"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("ct"))
        .groupBy("user_id").agg(min(col("ts")).as("pt"))
      v.agg(count(lit(1)).as("n_view")).crossJoin(
          c.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
        .withColumn("conv_click_e4", expr("n_click_after * 10000 div n_view"))
        .withColumn("conv_purchase_e4",
          expr("n_purchase_after * 10000 div n_click_after"))
    }),

    // ── G44: last-touch attribution ────────────────────────────────────
    // Every purchase attributed to the user's latest strictly-preceding
    // click within 1 h (tie-broken by event_id — total order, both
    // engines agree). The "latest preceding click" is a carry-forward
    // max over a user-partitioned window — ONE shuffle on user_id for
    // the whole corpus, the same shape however many purchases — never a
    // per-purchase lookup join. Daily attributed/organic counts.
    "q100_last_touch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("last_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("attributed", col("last_click_ts").isNotNull &&
          unix_timestamp(col("ts")) - unix_timestamp(col("last_click_ts")) <= 3600L)
        .groupBy(col("ts").cast(DateType).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
          sum(when(col("attributed"), 0L).otherwise(1L)).as("n_organic"))
        .orderBy("day")
    }),

    // ── G59: exponentially-decayed engagement score ────────────────────
    // Per-user recency-weighted activity: Σ value · 2^(−age_days), the
    // feature that ranks "active this week" above "active last month"
    // without a cutoff cliff. EXACT across engines: the half-life-one-
    // day weight is a power of two, so each term is v6 · 2^(30−age)
    // (ages beyond 30 days contribute 0 — below e6 resolution anyway)
    // and the sum is pure DECIMAL(38,0) integer arithmetic — no float
    // pow(), no order-dependent double sum. One 1-row anchor broadcast +
    // one user-keyed aggregate; at 10⁹ users it's still a single
    // partial-agg shuffle on user_id.
    "q114_decayed_engagement" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          round(col("value") * 1000000).cast(LongType).as("v6"))
      val anchor = e.agg(max(col("day")).as("maxd"))
      e.crossJoin(broadcast(anchor))
        .withColumn("age", datediff(col("maxd"), col("day")))
        .withColumn("wterm",
          when(col("age") <= 30,
            col("v6").cast(dec) *
              expr("cast(shiftleft(cast(1 as bigint), 30 - age) as decimal(38,0))"))
            .otherwise(lit(0).cast(dec)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("wterm")).cast(dec).as("score_x2e30"),
          max(col("day")).as("last_day"))
        .orderBy("user_id")
    }),

    // ── G60: event-transition matrix ───────────────────────────────────
    // First-order Markov transitions over each user's event sequence
    // (the session-flow model behind next-action features and anomaly
    // detection): lag(event_type) over a user-partitioned, totally-
    // ordered window (ts, then event_id — both engines agree on ties),
    // then one aggregate per (prev, next) pair with exact integer
    // row-probabilities. ONE shuffle on user_id for the sequencing and
    // one 25-row aggregate — at any corpus size the matrix is
    // |event types|², never corpus-shaped.
    "q115_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val t = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val totals = t.groupBy("prev").agg(sum(col("n")).as("n_from"))
      t.join(broadcast(totals), "prev")
        .withColumn("p_e6", expr("n * 1000000 div n_from"))
        .select("prev", "next", "n", "n_from", "p_e6")
        .orderBy("prev", "next")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q114_decayed_engagement" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |             CAST(round(value*1000000) AS BIGINT) AS v6 FROM events),
        |     a AS (SELECT MAX(day) AS maxd FROM e),
        |     t AS (SELECT user_id, day, v6,
        |             date_diff('day', day, maxd) AS age FROM e, a)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CASE WHEN age <= 30
        |                     THEN CAST(v6 AS HUGEINT) * (CAST(1 AS BIGINT) << (30 - age))
        |                     ELSE 0 END) AS DECIMAL(38,0)) AS score_x2e30,
        |       MAX(day) AS last_day
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q115_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type, ts, event_id,
        |             LAG(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS prev
        |           FROM events),
        |     t AS (SELECT prev, event_type AS next, COUNT(*) AS n
        |           FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type),
        |     tot AS (SELECT prev, SUM(n) AS n_from FROM t GROUP BY prev)
        |SELECT t.prev, t.next, t.n, CAST(tot.n_from AS BIGINT) AS n_from,
        |       CAST(t.n * 1000000 // tot.n_from AS BIGINT) AS p_e6
        |FROM t JOIN tot ON t.prev = tot.prev
        |ORDER BY t.prev, t.next""".stripMargin,

    "q98_cohort_retention" ->
      s"""WITH uw AS (SELECT DISTINCT user_id,
         |       CAST(datediff('day', DATE '$Anchor', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
         |     FROM events),
         |     c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id)
         |SELECT c.cohort_week, uw.wk - c.cohort_week AS week_offset,
         |       COUNT(*) AS n_users
         |FROM uw JOIN c ON uw.user_id = c.user_id
         |GROUP BY c.cohort_week, uw.wk - c.cohort_week
         |ORDER BY cohort_week, week_offset""".stripMargin,

    "q99_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |     c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
        |           JOIN v ON e.user_id = v.user_id
        |           WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id),
        |     p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
        |           JOIN c ON e.user_id = c.user_id
        |           WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id),
        |     n AS (SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |                  (SELECT COUNT(*) FROM c) AS n_click_after,
        |                  (SELECT COUNT(*) FROM p) AS n_purchase_after)
        |SELECT n_view, n_click_after, n_purchase_after,
        |       n_click_after * 10000 // n_view AS conv_click_e4,
        |       n_purchase_after * 10000 // n_click_after AS conv_purchase_e4
        |FROM n""".stripMargin,

    "q100_last_touch" ->
      """WITH e AS (SELECT event_id, user_id, event_type, ts FROM events
        |           WHERE event_type IN ('click', 'purchase')),
        |     p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        |     lc AS (SELECT p.event_id AS pid, MAX(c.ts) AS last_click_ts
        |            FROM p JOIN e c ON c.user_id = p.user_id
        |              AND c.event_type = 'click'
        |              AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        |            GROUP BY p.event_id),
        |     a AS (SELECT p.ts, lc.last_click_ts
        |           FROM p LEFT JOIN lc ON p.event_id = lc.pid)
        |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases,
        |       CAST(SUM(CASE WHEN last_click_ts IS NOT NULL
        |             AND epoch_ns(ts) // 1000000000 - epoch_ns(last_click_ts) // 1000000000 <= 3600
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        |       CAST(SUM(CASE WHEN last_click_ts IS NOT NULL
        |             AND epoch_ns(ts) // 1000000000 - epoch_ns(last_click_ts) // 1000000000 <= 3600
        |           THEN 0 ELSE 1 END) AS BIGINT) AS n_organic
        |FROM a GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin
  )
}
