package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Temporal / lifecycle operators (round 9, ninth wave): the
  * first/last/nth window-frame surface, range-partitioned layout,
  * the deletion cascade (right-to-be-forgotten), linear gap
  * interpolation, and negative-pattern funnels.
  *
  * Reference intent: the reference's temporal logic is "last 7 days,
  * predict next 7" (services/training); these are the calendar-
  * and-lifecycle operators that grow around it — boundary-value
  * windows for dashboards, layout that prunes range scans, the
  * deletion pipeline privacy law requires, repair for gappy series,
  * and the funnel definition that excludes poisoned journeys.
  */
object TemporalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G155: boundary-value window frames (first/last/nth, RANGE) ─────
    // The §2.5 frame surface a dashboard leans on: per event type and
    // day, the first/last/nth daily total of the TRAILING 7-day RANGE
    // window — first_value answers "where did the week start",
    // last_value with a RANGE frame pins the frame-end fine print
    // (defaults to CURRENT ROW, not the partition end), nth_value(2)
    // is the "second reading" robustness trick. All three ride ONE
    // type-partitioned range window over pre-aggregated daily rows
    // (q62's trailing-frame discipline).
    "q210_window_frames" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("v6"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("day").cast(TimestampType).cast(LongType))
        .rangeBetween(-6 * 86400L, 0L)
      daily
        .withColumn("first_v6", first("v6").over(w))
        .withColumn("last_v6", last("v6").over(w))
        .withColumn("nth2_v6", expr("nth_value(v6, 2)").over(w))
        .select("event_type", "day", "v6", "first_v6", "last_v6", "nth2_v6")
        .orderBy("event_type", "day")
    }),

    // ── G156: range-partitioned layout audit (sort-clustered files) ────
    // The write-side move that makes range scans prune: repartition by
    // RANGE on the cluster key, sort within partitions, land one file
    // per range. The audit reads the layout back with per-file
    // provenance (input_file_name) and proves the invariant that
    // file-skipping depends on: per-file [min, max] key spans are
    // PAIRWISE DISJOINT, so any key-range predicate touches the
    // minimal file set. Range boundaries come from sampling, so per-
    // file counts are layout-private — the OUTPUT is the boundary-
    // independent contract: file count, total rows, overlapping span
    // pairs (must be 0), and the global key span. The Spark side
    // PROVES the zero by computing it; the oracle states the
    // contract.
    "q211_range_layout" -> ((s, dir) => {
      val tbl = PipelineQueries.cachedFixture(s"rangelay|$dir") { work =>
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("cast(round(value * 1000000) as bigint)").as("v6"))
          .repartitionByRange(8, col("user_id"))
          .sortWithinPartitions("user_id", "event_id")
          .write.mode("overwrite").parquet(s"$work/t")
      } + "/t"
      val files = s.read.parquet(tbl)
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("n_rows"),
          min("user_id").as("flo"), max("user_id").as("fhi"))
      val ordered = files
        .withColumn("next_lo", lead("flo", 1).over(boundedGlobalRank(col("flo"), col("f"))))
        .withColumn("overlaps_next",
          coalesce(col("next_lo") <= col("fhi"), lit(false)))
      ordered.agg(
        count(lit(1)).as("n_files"),
        sum("n_rows").as("n_rows"),
        sum(col("overlaps_next").cast(LongType)).as("n_overlaps"),
        min("flo").as("lo"), max("fhi").as("hi"))
    }),

    // ── G157: deletion cascade (right-to-be-forgotten ledger) ──────────
    // Privacy law's hard requirement: given a deletion list, scrub
    // every row of those users AND account for what was removed (the
    // auditor wants the ledger, not trust). The list here is the
    // deterministic user_id % 101 = 0 cohort; the scrub is a broadcast
    // anti-join (the list is always small next to the corpus); the
    // ledger counts removed vs surviving rows per event type, plus the
    // distinct users actually hit — the q118/q140 privacy family's
    // write-path member. At 100 TB this runs as the delete-compaction
    // job; the anti-join IS its plan.
    "q212_deletion_cascade" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val doomed = e.select("user_id").distinct()
        .filter(col("user_id") % 101 === 0)
      val kept = e.join(broadcast(doomed), Seq("user_id"), "left_anti")
      val removed = e.join(broadcast(doomed), Seq("user_id"), "left_semi")
      val ledger = removed.groupBy("event_type")
        .agg(count(lit(1)).as("n_removed"),
          countDistinct("user_id").as("n_users_hit"))
      kept.groupBy("event_type").agg(count(lit(1)).as("n_kept"))
        .join(ledger, Seq("event_type"), "left")
        .select(col("event_type"), col("n_kept"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          coalesce(col("n_users_hit"), lit(0L)).as("n_users_hit"))
        .orderBy("event_type")
    }),

    // ── G158: linear gap interpolation (series repair) ─────────────────
    // q105 forward-fills gaps; training pipelines often want LINEAR
    // interpolation instead: a missing day between two observations
    // gets v_prev + (v_next − v_prev)·(d − d_prev) div (d_next −
    // d_prev) — exact floor rational, monotone between endpoints. Per
    // (type, day) the observed daily table joins a generated day spine
    // (X9 sequence/explode); prev/next observation values come from
    // two carry windows on ONE type exchange (last-non-null backward +
    // first-non-null forward — the q40 as-of machinery both ways);
    // edge gaps (before first / after last observation) stay NULL by
    // the standard convention.
    "q213_linear_interpolate" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        // deterministic thinning: drop ~1/3 of observed days to create gaps
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("v6"))
        .filter(dayofmonth(col("day")) % 3 =!= 0)
      val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
      val spine = span.select(explode(expr("sequence(d0, d1)")).as("day"))
      val joined = spine.join(daily, Seq("day"), "left")
      val wAsc = boundedGlobalRank(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = boundedGlobalRank(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined
        .withColumn("pv", last("v6", ignoreNulls = true).over(wAsc))
        .withColumn("pd", last(when(col("v6").isNotNull, col("day")), ignoreNulls = true).over(wAsc))
        .withColumn("nv", last("v6", ignoreNulls = true).over(wDesc))
        .withColumn("nd", last(when(col("v6").isNotNull, col("day")), ignoreNulls = true).over(wDesc))
        .withColumn("v6_filled",
          when(col("v6").isNotNull, col("v6"))
            .otherwise(expr(
              // sign-explicit: (nv-pv) can be negative and Spark `div`
              // truncates where DuckDB `//` floors
              """pv + (case when nv < pv
                |  then -((cast(pv - nv as bigint) * datediff(day, pd))
                |          div datediff(nd, pd))
                |  else ((cast(nv - pv as bigint) * datediff(day, pd))
                |          div datediff(nd, pd)) end)""".stripMargin)))
        .withColumn("interpolated", col("v6").isNull && col("v6_filled").isNotNull)
        .select("day", "v6_filled", "interpolated")
        .orderBy("day")
    }),

    // ── G159: negative-pattern funnel (clean conversions) ──────────────
    // "Click → purchase with NO error in between" — the funnel
    // definition that excludes poisoned journeys, and the negative
    // pattern naive funnels silently overcount. No interval join: two
    // carry-forward windows on ONE per-user sort exchange track the
    // last click and last error time at every purchase; the purchase
    // converts CLEAN iff last_click exists and last_error (if any)
    // precedes it. Output: clean vs poisoned vs cold (no prior click)
    // purchase counts — three conditional sums over the windowed scan.
    "q214_clean_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("us"))).over(w))
        .withColumn("last_error",
          max(when(col("event_type") === "error", col("us"))).over(w))
        .filter(col("event_type") === "purchase")
      e.agg(
        sum(when(col("last_click").isNotNull &&
          (col("last_error").isNull || col("last_error") < col("last_click")), 1L)
          .otherwise(0L)).as("n_clean"),
        sum(when(col("last_click").isNotNull && col("last_error").isNotNull &&
          col("last_error") >= col("last_click"), 1L).otherwise(0L)).as("n_poisoned"),
        sum(when(col("last_click").isNull, 1L).otherwise(0L)).as("n_cold"),
        count(lit(1)).as("n_purchases"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q210_window_frames" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v6
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type, day, v6,
        |       FIRST_VALUE(v6) OVER w AS first_v6,
        |       LAST_VALUE(v6) OVER w AS last_v6,
        |       NTH_VALUE(v6, 2) OVER w AS nth2_v6
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    "q211_range_layout" ->
      """SELECT CAST(8 AS BIGINT) AS n_files, COUNT(*) AS n_rows,
        |       CAST(0 AS BIGINT) AS n_overlaps,
        |       MIN(user_id) AS lo, MAX(user_id) AS hi
        |FROM events""".stripMargin,

    "q212_deletion_cascade" ->
      """WITH doomed AS (SELECT DISTINCT user_id FROM events
        |                WHERE user_id % 101 = 0)
        |SELECT event_type,
        |       CAST(SUM(CASE WHEN user_id % 101 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |         AS n_kept,
        |       CAST(SUM(CASE WHEN user_id % 101 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_removed,
        |       CAST(COUNT(DISTINCT CASE WHEN user_id % 101 = 0
        |                                THEN user_id END) AS BIGINT) AS n_users_hit
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q213_linear_interpolate" ->
      """WITH daily0 AS (SELECT CAST(ts AS DATE) AS day,
        |                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v6
        |               FROM events WHERE event_type = 'purchase'
        |               GROUP BY 1),
        |thin AS (SELECT * FROM daily0 WHERE dayofmonth(day) % 3 != 0),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM thin),
        |spine AS (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |          FROM span),
        |j AS (SELECT spine.day, thin.v6 FROM spine LEFT JOIN thin USING (day)),
        |f AS (SELECT day, v6,
        |        MAX(CASE WHEN v6 IS NOT NULL THEN day END)
        |          OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
        |        MIN(CASE WHEN v6 IS NOT NULL THEN day END)
        |          OVER (ORDER BY day DESC ROWS UNBOUNDED PRECEDING) AS nd
        |      FROM j),
        |g AS (SELECT f.day, f.v6, f.pd, f.nd,
        |        dp.v6 AS pv, dn.v6 AS nv
        |      FROM f LEFT JOIN thin dp ON dp.day = f.pd
        |             LEFT JOIN thin dn ON dn.day = f.nd)
        |SELECT day,
        |       CAST(CASE WHEN v6 IS NOT NULL THEN v6
        |                 WHEN pv IS NULL OR nv IS NULL THEN NULL
        |                 WHEN nv < pv THEN pv - ((pv - nv) * date_diff('day', pd, day)
        |                      // date_diff('day', pd, nd))
        |                 ELSE pv + ((nv - pv) * date_diff('day', pd, day)
        |                      // date_diff('day', pd, nd))
        |            END AS BIGINT) AS v6_filled,
        |       v6 IS NULL AND pv IS NOT NULL AND nv IS NOT NULL AS interpolated
        |FROM g ORDER BY day""".stripMargin,

    "q214_clean_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |w AS (SELECT user_id, event_type, us,
        |        MAX(CASE WHEN event_type = 'click' THEN us END)
        |          OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS last_click,
        |        MAX(CASE WHEN event_type = 'error' THEN us END)
        |          OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS last_error
        |      FROM e),
        |p AS (SELECT * FROM w WHERE event_type = 'purchase')
        |SELECT
        |  CAST(SUM(CASE WHEN last_click IS NOT NULL AND
        |                     (last_error IS NULL OR last_error < last_click)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(SUM(CASE WHEN last_click IS NOT NULL AND last_error IS NOT NULL
        |                     AND last_error >= last_click
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_poisoned,
        |  CAST(SUM(CASE WHEN last_click IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cold,
        |  COUNT(*) AS n_purchases
        |FROM p""".stripMargin
  )
}
