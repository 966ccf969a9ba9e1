package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Calendar and comparison operators (round 9, twentieth wave): ISO
  * business-calendar rollups, period-over-period delta attribution,
  * and leaderboard churn.
  *
  * Reference intent: the reference's only calendar logic is "rebase the
  * seed to yesterday" (services/data-producer/scripts/
  * put_data_in_postgres.py:30-43); real revenue reporting lives on the
  * ISO business calendar, explains month-over-month deltas by segment,
  * and watches leaderboards move. Exact integers throughout.
  */
object CalendarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G196: ISO business-calendar rollup ─────────────────────────────
    // Revenue by ISO (week-year, week) with the business/weekend split
    // — the fiscal-reporting grain. ISO week arithmetic is derived
    // explicitly from the epoch-day (Thursday rule: the ISO week-year
    // of d is the calendar year of the Thursday of d's week), NOT from
    // an engine builtin, so both engines compute the identical
    // partition; weekend = epoch-day mod 7 ∈ {2,3} (1970-01-01 was a
    // Thursday). One aggregate, |weeks| output rows.
    "q251_business_calendar" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .withColumn("ed", expr("datediff(o_orderdate, date '1970-01-01')").cast(LongType))
        // Monday of the ISO week containing ed: 1970-01-01 is Thursday
        // (dow 3 with Monday=0 ⇒ (ed + 3) % 7 maps Monday→0)
        .withColumn("mon", expr("ed - ((ed + 3) % 7)"))
        .withColumn("thu", expr("mon + 3"))
        .withColumn("wyear", year(expr("date_add(date '1970-01-01', cast(thu as int))")))
        .withColumn("week", expr("(thu - (datediff(make_date(wyear, 1, 4), date '1970-01-01') - ((datediff(make_date(wyear, 1, 4), date '1970-01-01') + 3) % 7) + 3)) div 7 + 1"))
        .withColumn("is_weekend", expr("((ed + 3) % 7) >= 5"))
        .withColumn("v_c", expr("cast(round(o_totalprice * 100) as bigint)"))
      d.groupBy("wyear", "week")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(!col("is_weekend"), col("v_c")).otherwise(0L)).as("bus_v_c"),
          sum(when(col("is_weekend"), col("v_c")).otherwise(0L)).as("wkd_v_c"))
        .orderBy("wyear", "week")
    }),

    // ── G197: period-over-period delta attribution ─────────────────────
    // "Revenue moved ΔX month-over-month — which priority segment drove
    // it?" The variance-analysis decomposition: per segment the two
    // monthly sums, the signed delta, and its e4 share of the total
    // delta (sign-explicit floor). One conditional aggregate over the
    // two months (filter pushed to the scan), |segments| output rows —
    // the BI staple that answers WHY a topline moved.
    "q252_delta_attribution" -> ((s, dir) => {
      val m1 = "1996-03"; val m2 = "1996-04"
      val d = Tables.orders(s, dir)
        .withColumn("m", date_format(col("o_orderdate"), "yyyy-MM"))
        .filter(col("m").isin(m1, m2))
        .withColumn("v_c", expr("cast(round(o_totalprice * 100) as bigint)"))
      val seg = d.groupBy("o_orderpriority")
        .agg(sum(when(col("m") === m1, col("v_c")).otherwise(0L)).as("v1_c"),
          sum(when(col("m") === m2, col("v_c")).otherwise(0L)).as("v2_c"))
        .withColumn("delta_c", col("v2_c") - col("v1_c"))
      val tot = seg.agg(sum("delta_c").as("tot_delta_c"))
      seg.crossJoin(broadcast(tot))
        .withColumn("share_e4", expr(
          """case when tot_delta_c = 0 then 0
            |     when delta_c * 10000 < 0 then -((abs(delta_c) * 10000) div abs(tot_delta_c)) * (case when tot_delta_c < 0 then -1 else 1 end)
            |     else ((delta_c * 10000) div abs(tot_delta_c)) * (case when tot_delta_c < 0 then -1 else 1 end) end""".stripMargin))
        .select("o_orderpriority", "v1_c", "v2_c", "delta_c", "tot_delta_c", "share_e4")
        .orderBy("o_orderpriority")
    }),

    // ── G198: leaderboard churn (top-k diff between periods) ───────────
    // The "trending terms" read: token top-20 by frequency in the
    // corpus's first half vs second half (doc_id parity split —
    // deterministic), full-outer joined into an entered/exited/moved
    // ledger with rank shifts. Two census aggregates + two |vocab|-row
    // rank windows + one outer join on the top-k union — the
    // leaderboard is k-sized, so everything after the census is free.
    "q253_leaderboard_churn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .withColumn("half", expr("cast(doc_id % 2 as int)"))
        .groupBy("half", "tok").agg(count(lit(1)).as("n"))
      // top-20 per half via TakeOrderedAndProject (orderBy().limit —
      // per-partition heaps), rank attached AFTER the limit over the 20
      // survivors — never an unpartitioned window over the vocab table.
      def top(h: Int) = toks.filter(col("half") === h)
        .orderBy(col("n").desc, col("tok").asc).limit(20)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("n").desc, col("tok").asc)).cast(LongType))
      val a = top(0).select(col("tok"), col("n").as("n_a"), col("rk").as("rk_a"))
      val b = top(1).select(col("tok"), col("n").as("n_b"), col("rk").as("rk_b"))
      a.join(b, Seq("tok"), "full_outer")
        .withColumn("status", expr(
          """case when rk_a is null then 'entered'
            |     when rk_b is null then 'exited'
            |     when rk_a = rk_b then 'held' else 'moved' end""".stripMargin))
        .withColumn("shift", coalesce(col("rk_a"), lit(21L)) - coalesce(col("rk_b"), lit(21L)))
        .orderBy(coalesce(col("rk_b"), lit(21L)), coalesce(col("rk_a"), lit(21L)), col("tok"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q251_business_calendar" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS ed,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c
        |           FROM orders),
        |w AS (SELECT v_c, ed,
        |        ed - ((ed + 3) % 7) AS mon,
        |        ed - ((ed + 3) % 7) + 3 AS thu,
        |        ((ed + 3) % 7) >= 5 AS is_weekend
        |      FROM d),
        |y AS (SELECT v_c, thu, is_weekend,
        |        year(DATE '1970-01-01' + CAST(thu AS INT)) AS wyear
        |      FROM w),
        |j4 AS (SELECT y.*,
        |         CAST(make_date(wyear, 1, 4) - DATE '1970-01-01' AS BIGINT) AS ed4
        |       FROM y)
        |SELECT wyear, CAST((thu - (ed4 - ((ed4 + 3) % 7) + 3)) // 7 + 1 AS BIGINT) AS week,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN NOT is_weekend THEN v_c ELSE 0 END) AS BIGINT) AS bus_v_c,
        |       CAST(SUM(CASE WHEN is_weekend THEN v_c ELSE 0 END) AS BIGINT) AS wkd_v_c
        |FROM j4 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q252_delta_attribution" ->
      """WITH d AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS m,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v_c
        |           FROM orders
        |           WHERE strftime(o_orderdate, '%Y-%m') IN ('1996-03', '1996-04')),
        |seg AS (SELECT o_orderpriority,
        |          SUM(CASE WHEN m = '1996-03' THEN v_c ELSE 0 END) AS v1_c,
        |          SUM(CASE WHEN m = '1996-04' THEN v_c ELSE 0 END) AS v2_c
        |        FROM d GROUP BY 1),
        |s2 AS (SELECT *, v2_c - v1_c AS delta_c FROM seg),
        |t AS (SELECT SUM(delta_c) AS tot_delta_c FROM s2)
        |SELECT o_orderpriority, CAST(v1_c AS BIGINT) AS v1_c,
        |       CAST(v2_c AS BIGINT) AS v2_c, CAST(delta_c AS BIGINT) AS delta_c,
        |       CAST(t.tot_delta_c AS BIGINT) AS tot_delta_c,
        |       CAST(CASE WHEN t.tot_delta_c = 0 THEN 0
        |                 WHEN delta_c * 10000 < 0
        |                 THEN -((ABS(delta_c) * 10000) // ABS(t.tot_delta_c))
        |                      * (CASE WHEN t.tot_delta_c < 0 THEN -1 ELSE 1 END)
        |                 ELSE ((delta_c * 10000) // ABS(t.tot_delta_c))
        |                      * (CASE WHEN t.tot_delta_c < 0 THEN -1 ELSE 1 END) END
        |         AS BIGINT) AS share_e4
        |FROM s2, t ORDER BY o_orderpriority""".stripMargin,

    "q253_leaderboard_churn" -> {
      val toks = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH t AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS half,
         |             UNNEST($toks) AS tok
         |           FROM documents),
         |c AS (SELECT half, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
         |ra AS (SELECT tok, n AS n_a, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
         |         AS BIGINT) AS rk_a FROM c WHERE half = 0
         |       QUALIFY rk_a <= 20),
         |rb AS (SELECT tok, n AS n_b, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
         |         AS BIGINT) AS rk_b FROM c WHERE half = 1
         |       QUALIFY rk_b <= 20)
         |SELECT COALESCE(ra.tok, rb.tok) AS tok,
         |       CAST(n_a AS BIGINT) AS n_a, rk_a,
         |       CAST(n_b AS BIGINT) AS n_b, rk_b,
         |       CASE WHEN rk_a IS NULL THEN 'entered'
         |            WHEN rk_b IS NULL THEN 'exited'
         |            WHEN rk_a = rk_b THEN 'held' ELSE 'moved' END AS status,
         |       COALESCE(rk_a, 21) - COALESCE(rk_b, 21) AS shift
         |FROM ra FULL OUTER JOIN rb ON ra.tok = rb.tok
         |ORDER BY COALESCE(rk_b, 21), COALESCE(rk_a, 21), COALESCE(ra.tok, rb.tok)""".stripMargin
    }
  )
}
