package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Profiling / preparation operators (round 9, tenth wave): sweep-line
  * concurrency, robust feature scaling, temporal-split leakage, and
  * the CBO column-correlation audit.
  *
  * Reference intent: the reference's data prep is a per-(store,
  * product) pandas filter-and-rename in one process
  * (services/training-service/app/train_utils.py:56-68,
  * prep_store_data); these are the
  * whole-corpus preparation and capacity questions that appear the
  * moment the same pipeline runs on shared infrastructure — how many
  * orders are in flight at once, features scaled so outliers can't
  * dominate, splits that don't leak entities across time, and the
  * column-correlation fact a cost-based optimizer needs to not
  * misestimate joins.
  */
object ProfileQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G160: sweep-line concurrency census (orders in flight) ─────────
    // "How many orders were open at once?" — the capacity question
    // answered WITHOUT pairwise interval joins (q91's overlap shape
    // dies at n² pairs): each order contributes +1 at o_orderdate and
    // −1 the day after its last line item ships; summing deltas per
    // day and running-summing over the ≤|days| delta table gives the
    // exact concurrency curve — the classic sweep-line, one corpus
    // aggregate + one tiny sort window. Output: per month, the peak
    // and end-of-month open-order counts.
    "q215_sweep_concurrency" -> ((s, dir) => {
      val spans = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("okey"))
        .agg(max(to_date(col("l_shipdate"))).as("shipped"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"), to_date(col("o_orderdate")).as("opened")),
          Seq("okey"))
      val deltas = spans.select(col("opened").as("day"), lit(1L).as("d"))
        .unionByName(spans.select(date_add(col("shipped"), 1).as("day"), lit(-1L).as("d")))
        .groupBy("day").agg(sum("d").as("delta"))
      val curve = deltas
        .withColumn("open", sum("delta").over(
          boundedGlobalRank(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      curve.groupBy(date_format(col("day"), "yyyy-MM").as("month"))
        .agg(max("open").as("peak_open"),
          max_by(col("open"), col("day")).as("eom_open"))
        .orderBy("month")
    }),

    // ── G161: robust feature scaling (median/MAD standardization) ──────
    // z-scores let one outlier set the scale; robust scaling uses
    // median and MAD — and stays integer-exact where σ needs a sqrt.
    // The distribution collapses to (type, value, count) CELLS first
    // (q174's move — all order statistics come from the cell table,
    // never a corpus sort), the DISC median and MAD derive by
    // ceil-rank cumulative selection, and every row then projects
    // robust_e4 = sign·(|v−med|·10⁴ div MAD) — a full-corpus row-grain
    // feature transform whose heavy work is two tiny cell passes.
    // MAD = 0 (more than half the mass at one value) → 0 by
    // convention.
    "q216_robust_scaling" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
      def discMedian(cells: DataFrame, valueCol: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(valueCol)
        cells
          .withColumn("cum", sum("cnt").over(w))
          .withColumn("tot", sum("cnt").over(Window.partitionBy("event_type")))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("event_type").agg(min(valueCol).as("med"))
      }
      val med = discMedian(
        e.groupBy("event_type", "v6").agg(count(lit(1)).as("cnt")), "v6")
      val madCells = e.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("v6") - col("med")))
        .groupBy("event_type", "ad").agg(count(lit(1)).as("cnt"))
      val mad = discMedian(madCells, "ad")
        .withColumnRenamed("med", "mad")
      e.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .withColumn("robust_e4", expr(
          """case when mad = 0 then 0
            | when v6 < med then -((med - v6) * 10000 div mad)
            | else (v6 - med) * 10000 div mad end""".stripMargin))
        .select("event_id", "event_type", "v6", "robust_e4")
        .orderBy("event_id")
    }),

    // ── G162: temporal-split entity leakage audit ──────────────────────
    // A time-based train/test split (train < Jan 21, test ≥) looks
    // leak-free until you ask about ENTITIES: a user active in both
    // windows carries memorizable identity across the boundary — the
    // leakage that inflates every naive temporal backtest. One
    // conditional per-(type, user) aggregate, then a |types|-row
    // rollup: train/test/overlap user counts and the leak share of
    // test users, exact e4. The q82/q145/q184 split-hygiene family's
    // temporal member.
    "q217_split_leakage" -> ((s, dir) => {
      val cut = lit("2024-01-21").cast(DateType)
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(max(when(to_date(col("ts")) < cut, 1L).otherwise(0L)).as("in_train"),
          max(when(to_date(col("ts")) >= cut, 1L).otherwise(0L)).as("in_test"))
        .groupBy("event_type")
        .agg(sum("in_train").as("n_train_users"),
          sum("in_test").as("n_test_users"),
          sum(col("in_train") * col("in_test")).as("n_overlap"))
        .withColumn("leak_e4", expr(
          "case when n_test_users = 0 then 0 " +
            "else n_overlap * 10000 div n_test_users end"))
        .orderBy("event_type")
    }),

    // ── G163: column-correlation NDV audit (CBO statistics) ────────────
    // Cost-based optimizers assume column independence —
    // NDV(a,b) ≈ NDV(a)·NDV(b) — and misestimate joins by orders of
    // magnitude when columns correlate. The audit states the fact: for
    // (type, day) and (user, day), the observed pair-NDV vs the
    // independence prediction and their ratio (10⁴ = perfectly
    // independent, → 0 = fully correlated). Three exact distinct
    // aggregates per pair over one scan each; at 10⁹ rows the same
    // query runs on q49's HLL or q204's KMV arms. This is the number
    // that justifies multi-column statistics in any engine's CBO.
    "q218_ndv_correlation" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
      def audit(a: String, b: String): DataFrame = e
        .agg(countDistinct(col(a)).as("ndv_a"),
          countDistinct(col(b)).as("ndv_b"),
          countDistinct(col(a), col(b)).as("ndv_pair"))
        .select(lit(s"$a,$b").as("cols"), col("ndv_a"), col("ndv_b"), col("ndv_pair"))
        .withColumn("independence_e4", expr(
          "ndv_pair * 10000 div least(ndv_a * ndv_b, 922337203685477580)"))
      audit("event_type", "day").unionByName(audit("user_id", "day"))
        .orderBy("cols")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q215_sweep_concurrency" ->
      """WITH spans AS (
        |  SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS opened,
        |         MAX(CAST(l_shipdate AS DATE)) AS shipped
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |deltas AS (
        |  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
        |    SELECT opened AS day, 1 AS d FROM spans
        |    UNION ALL SELECT shipped + 1, -1 FROM spans)
        |  GROUP BY day),
        |curve AS (SELECT day,
        |            SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS open
        |          FROM deltas)
        |SELECT strftime(day, '%Y-%m') AS month,
        |       CAST(MAX(open) AS BIGINT) AS peak_open,
        |       CAST(arg_max(open, day) AS BIGINT) AS eom_open
        |FROM curve GROUP BY 1 ORDER BY 1""".stripMargin,

    "q216_robust_scaling" ->
      """WITH e AS (SELECT event_id, event_type,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |vc AS (SELECT event_type, v6, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
        |vm AS (SELECT event_type, MIN(v6) AS med FROM (
        |         SELECT event_type, v6,
        |           SUM(cnt) OVER (PARTITION BY event_type ORDER BY v6
        |                          ROWS UNBOUNDED PRECEDING) AS cum,
        |           SUM(cnt) OVER (PARTITION BY event_type) AS tot
        |         FROM vc) WHERE cum * 2 >= tot GROUP BY 1),
        |ac AS (SELECT e.event_type, ABS(v6 - med) AS ad, COUNT(*) AS cnt
        |       FROM e JOIN vm ON vm.event_type = e.event_type GROUP BY 1, 2),
        |am AS (SELECT event_type, MIN(ad) AS mad FROM (
        |         SELECT event_type, ad,
        |           SUM(cnt) OVER (PARTITION BY event_type ORDER BY ad
        |                          ROWS UNBOUNDED PRECEDING) AS cum,
        |           SUM(cnt) OVER (PARTITION BY event_type) AS tot
        |         FROM ac) WHERE cum * 2 >= tot GROUP BY 1)
        |SELECT event_id, e.event_type, v6,
        |       CAST(CASE WHEN mad = 0 THEN 0
        |                 WHEN v6 < med THEN -((med - v6) * 10000 // mad)
        |                 ELSE (v6 - med) * 10000 // mad END AS BIGINT) AS robust_e4
        |FROM e JOIN vm ON vm.event_type = e.event_type
        |       JOIN am ON am.event_type = e.event_type
        |ORDER BY event_id""".stripMargin,

    "q217_split_leakage" ->
      """WITH u AS (SELECT event_type, user_id,
        |             MAX(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-21'
        |                      THEN 1 ELSE 0 END) AS in_train,
        |             MAX(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-21'
        |                      THEN 1 ELSE 0 END) AS in_test
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(SUM(in_train) AS BIGINT) AS n_train_users,
        |       CAST(SUM(in_test) AS BIGINT) AS n_test_users,
        |       CAST(SUM(in_train * in_test) AS BIGINT) AS n_overlap,
        |       CAST(CASE WHEN SUM(in_test) = 0 THEN 0
        |                 ELSE SUM(in_train * in_test) * 10000 // SUM(in_test)
        |            END AS BIGINT) AS leak_e4
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q218_ndv_correlation" ->
      """WITH e AS (SELECT event_type, user_id, CAST(ts AS DATE) AS day
        |           FROM events),
        |a AS (SELECT 'event_type,day' AS cols,
        |        COUNT(DISTINCT event_type) AS ndv_a,
        |        COUNT(DISTINCT day) AS ndv_b,
        |        COUNT(DISTINCT (event_type, day)) AS ndv_pair
        |      FROM e),
        |b AS (SELECT 'user_id,day' AS cols,
        |        COUNT(DISTINCT user_id) AS ndv_a,
        |        COUNT(DISTINCT day) AS ndv_b,
        |        COUNT(DISTINCT (user_id, day)) AS ndv_pair
        |      FROM e),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT cols, ndv_a, ndv_b, ndv_pair,
        |       CAST(ndv_pair * 10000 //
        |            LEAST(ndv_a * ndv_b, 922337203685477580) AS BIGINT)
        |         AS independence_e4
        |FROM u ORDER BY cols""".stripMargin
  )
}
