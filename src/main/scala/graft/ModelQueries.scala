package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Model-selection and uncertainty operators (round 9, sixteenth
  * wave): ridge-regularized trend fitting with walk-forward λ
  * selection, one exact rank-1 ALS sweep, a deterministic
  * hash-resampling confidence interval, and an overdispersion audit.
  *
  * Reference intent: the reference trains per-store Prophet models and
  * picks nothing — one config for all 1,115 stores
  * (services/training-service/app/train_utils.py:24-35). At fleet scale the
  * pipeline itself must select per-key hyperparameters, factorize
  * interaction matrices, and attach uncertainty to every estimate —
  * all stated here as exact-integer relational plans (sign-explicit
  * DECIMAL(38,0) floor division, the q154 discipline), so DuckDB
  * gates every number bit-for-bit.
  */
object ModelQueries {

  private val dec = DecimalType(38, 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G181: ridge trend fit + walk-forward λ selection ───────────────
    // Per event type, fit slope b_λ = num / (den + λ·n) for λ ∈
    // {0, 10⁴, 10⁶} (den-scale units) on the first ⅔ of days, score
    // each fit's SSE on the held-out last ⅓, and keep the λ with the
    // smallest validation error (tiebreak: smaller λ — prefer less
    // shrinkage at equal loss). The corpus collapses to |type|×|days|
    // daily cells ONCE; train moments are one aggregate over the train
    // split; the 3-λ grid is a broadcast cross join; validation SSE is
    // one join+aggregate over the val cells. Model selection as a
    // declarative plan — no driver loop, any number of keys.
    "q236_ridge_select" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
        .withColumn("x", datediff(col("day"),
          min(col("day")).over(Window.partitionBy("event_type"))).cast(LongType))
        .withColumn("n_all", count(lit(1))
          .over(Window.partitionBy("event_type")).cast(LongType))
        .withColumn("is_train", expr("x * 3 < (max(x) over (partition by event_type)) * 2"))
      val moments = daily.filter(col("is_train"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y6").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum(col("x").cast(dec) * col("y6").cast(dec)).as("sxy"))
      val lambdas = s.range(0, 3).select(
        expr("element_at(array(0L, 10000L, 1000000L), cast(id as int) + 1)").as("lambda"))
      val fits = moments.crossJoin(broadcast(lambdas))
        .withColumn("num", expr("cast(n as decimal(38,0)) * sxy - sx * sy"))
        .withColumn("den", expr("cast(n as decimal(38,0)) * sxx - sx * sx + cast(lambda as decimal(38,0)) * n"))
        .withColumn("slope6", expr(
          "cast(case when num < 0 then -(abs(num) div den) else num div den end as bigint)"))
        .withColumn("t", expr("sy - cast(slope6 as decimal(38,0)) * sx"))
        .withColumn("icept6", expr(
          "cast(case when t < 0 then -(abs(t) div cast(n as decimal(38,0))) " +
            "else t div cast(n as decimal(38,0)) end as bigint)"))
      val sse = daily.filter(!col("is_train"))
        .join(fits, "event_type")
        .withColumn("r", expr("cast(y6 - icept6 - slope6 * x as decimal(38,0))"))
        .groupBy("event_type", "lambda", "slope6", "icept6")
        .agg(sum(expr("r * r")).as("sse"), count(lit(1)).as("n_val"))
      sse.groupBy("event_type")
        .agg(min_by(struct(col("lambda"), col("slope6"), col("icept6"),
          col("sse"), col("n_val")), struct(col("sse"), col("lambda"))).as("best"))
        .select(col("event_type"), col("best.lambda").as("lambda"),
          col("best.slope6").as("slope6"), col("best.icept6").as("icept6"),
          col("best.sse").as("sse"), col("best.n_val").as("n_val"))
        .orderBy("event_type")
    }),

    // ── G182: rank-1 ALS sweep (exact alternating least squares) ───────
    // One full ALS alternation on the customer×part quantity matrix,
    // v⁰ ≡ 1: u_c = ⌊10⁶·Σ_p r⌋/n_c (the v-weighted LS solve, exact
    // since Σv² = n), then v_p = ⌊10⁶·Σ_c r·u_c⌋ / ⌊Σ_c u_c²/10⁶⌋ —
    // each half-step ONE join + aggregate on the ratings table, the
    // matrix-factorization shuffle shape at any rank (higher rank swaps
    // the scalar divide for a broadcast d×d solve, same data motion).
    // Complements q207 (neighborhood CF) with the model-based
    // recommender; q132 (k-means) with the other alternating-
    // optimization family. Top-20 parts by learned factor.
    "q237_als_rank1" -> ((s, dir) => {
      val r = FlowQueries.ratingsTable(s, dir).select("c", "p", "r")
      val u = r.groupBy("c")
        .agg(expr("sum(r) * 1000000 div count(1)").as("u6"),
          count(lit(1)).as("n_items"))
      r.join(u, "c")
        .groupBy("p")
        .agg(count(lit(1)).as("n_raters"),
          sum(expr("r * u6")).as("num6"),
          sum(expr("u6 * u6 div 1000000")).as("den6"))
        .withColumn("v6", expr("num6 * 1000000 div den6"))
        .select("p", "n_raters", "v6")
        .orderBy(col("v6").desc, col("p").asc)
        .limit(20)
    }),

    // ── G183: hash-resampling confidence interval (RNG-free bootstrap) ─
    // Uncertainty for the daily-revenue mean WITHOUT an RNG: 100
    // resamples where day d's weight in resample r is md5(d,r) mod 3
    // (mean-1 integer weights — a deterministic Poissonized bootstrap,
    // documented as such). Each resample mean is an exact cents
    // rational; the 95% interval is the nearest-rank order statistics
    // DERIVED from the surviving resample count n_rs (ceil(n·0.025)
    // and its mirror — ranks 3 and 98 when all 100 survive, but still
    // the right percentiles if an all-zero-weight resample is dropped
    // by the HAVING). Plan: |days| daily cells × 100 broadcast
    // resample ids — the fan-out touches the CELL table (≤ days·100
    // rows), never the corpus, which is scanned once; this is exactly
    // how bag-of-little-bootstraps scales to 100 TB.
    "q238_bootstrap_ci" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("v_c"))
      val rs = s.range(0, 100).select(col("id").as("rid"))
      val means = daily.crossJoin(broadcast(rs))
        .withColumn("w", expr(
          "cast(conv(substring(md5(concat(cast(day as string), '|', cast(rid as string))), 1, 4), 16, 10) as bigint) % 3"))
        .groupBy("rid")
        .agg(expr("sum(w * v_c)").as("wsum"), sum("w").as("wn"))
        .filter(col("wn") > 0)
        .withColumn("mean_c", expr("wsum div wn"))
      val ranked = means
        .withColumn("rk", row_number().over(boundedGlobalRank(col("mean_c").asc, col("rid").asc)))
        .withColumn("n_rs", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val point = daily.agg(expr("sum(v_c) div count(1)").as("point_c"))
      ranked
        .withColumn("rk_lo", expr("greatest(1L, (n_rs * 25 + 999) div 1000)"))
        .filter(col("rk") === col("rk_lo") || col("rk") === expr("n_rs - rk_lo + 1"))
        .groupBy("n_rs")
        .agg(min("mean_c").as("ci_lo_c"), max("mean_c").as("ci_hi_c"))
        .crossJoin(point)
        .select(col("point_c"), col("ci_lo_c"), col("ci_hi_c"),
          col("n_rs").cast(LongType).as("n_rs"))
    }),

    // ── G184: overdispersion audit (variance-to-mean, Poisson check) ───
    // Are daily event counts Poisson (D = σ²/μ ≈ 1) or bursty (D ≫ 1)?
    // The dispersion index decides whether a rate alert can assume
    // Poisson noise. Division-free exactness: report n·Σ(x−x̄)² and
    // (n−1)·Σx as e4-scaled ratio via DECIMAL floor, plus the flag
    // n·Σ(x−x̄)² > 2·(n−1)·Σx (D > 2, beyond Poisson). Daily cells →
    // one |type|-row aggregate; q141 measures spacing, q166 memory —
    // this measures NOISE SHAPE.
    "q239_dispersion" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        // n·Σ(x−x̄)² = n·Σx² − (Σx)²; D_e4 = 10⁴·(nΣx²−Sx²) div ((n−1)·Sx)
        .withColumn("css_n", expr("n * sxx - sx * sx"))
        .withColumn("d_e4", expr("css_n * 10000 div ((n - 1) * sx)"))
        .withColumn("overdispersed", expr("css_n > 2 * (n - 1) * sx"))
        .select("event_type", "n", "sx", "d_e4", "overdispersed")
        .orderBy("event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q236_ridge_select" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 SUM(CAST(round(value * 1000000) AS BIGINT)) AS y6
        |               FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, y6,
        |        CAST(datediff('day', MIN(day) OVER (PARTITION BY event_type), day)
        |          AS BIGINT) AS x,
        |        CAST(MAX(day) OVER (PARTITION BY event_type)
        |          - MIN(day) OVER (PARTITION BY event_type) AS BIGINT) AS xmax
        |      FROM daily),
        |tr AS (SELECT * FROM x WHERE x * 3 < xmax * 2),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y6 AS HUGEINT)) AS sy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |        SUM(CAST(x AS HUGEINT) * y6) AS sxy
        |      FROM tr GROUP BY event_type),
        |lam AS (SELECT UNNEST([0, 10000, 1000000]) AS lambda),
        |f AS (SELECT m.*, lam.lambda,
        |        CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - sx * sx + CAST(lambda AS HUGEINT) * n AS den
        |      FROM m CROSS JOIN lam),
        |f2 AS (SELECT event_type, lambda, n, sx, sy,
        |         CASE WHEN num < 0 THEN -(ABS(num) // den) ELSE num // den END AS slope6
        |       FROM f),
        |f3 AS (SELECT event_type, lambda, slope6,
        |         CASE WHEN sy - slope6 * sx < 0
        |              THEN -(ABS(sy - slope6 * sx) // n)
        |              ELSE (sy - slope6 * sx) // n END AS icept6
        |       FROM f2),
        |va AS (SELECT * FROM x WHERE NOT (x * 3 < xmax * 2)),
        |sse AS (SELECT va.event_type, f3.lambda, f3.slope6, f3.icept6,
        |          SUM(CAST(va.y6 - f3.icept6 - f3.slope6 * va.x AS HUGEINT)
        |            * (va.y6 - f3.icept6 - f3.slope6 * va.x)) AS sse,
        |          COUNT(*) AS n_val
        |        FROM va JOIN f3 USING (event_type)
        |        GROUP BY 1, 2, 3, 4),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |         ORDER BY sse, lambda) AS rn FROM sse)
        |SELECT event_type, CAST(lambda AS BIGINT) AS lambda,
        |       CAST(slope6 AS BIGINT) AS slope6, CAST(icept6 AS BIGINT) AS icept6,
        |       CAST(sse AS DECIMAL(38,0)) AS sse, CAST(n_val AS BIGINT) AS n_val
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q237_als_rank1" ->
      """WITH r AS (SELECT o.o_custkey AS c, l.l_partkey AS p,
        |             SUM(CAST(round(l_quantity) AS BIGINT)) AS r
        |           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |           GROUP BY 1, 2),
        |u AS (SELECT c, SUM(r) * 1000000 // COUNT(*) AS u6 FROM r GROUP BY c),
        |v AS (SELECT r.p, COUNT(*) AS n_raters,
        |        SUM(r.r * u.u6) AS num6,
        |        SUM(u.u6 * u.u6 // 1000000) AS den6
        |      FROM r JOIN u USING (c) GROUP BY r.p)
        |SELECT p, CAST(n_raters AS BIGINT) AS n_raters,
        |       CAST(num6 * 1000000 // den6 AS BIGINT) AS v6
        |FROM v ORDER BY v6 DESC, p LIMIT 20""".stripMargin,

    "q238_bootstrap_ci" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |                 SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v_c
        |               FROM orders GROUP BY 1),
        |rs AS (SELECT UNNEST(range(0, 100)) AS rid),
        |w AS (SELECT daily.day, daily.v_c, rs.rid,
        |        CAST('0x' || substr(md5(CAST(daily.day AS VARCHAR) || '|' ||
        |          CAST(rs.rid AS VARCHAR)), 1, 4) AS BIGINT) % 3 AS w
        |      FROM daily CROSS JOIN rs),
        |means AS (SELECT rid, SUM(w * v_c) // SUM(w) AS mean_c
        |          FROM w GROUP BY rid HAVING SUM(w) > 0),
        |ranked AS (SELECT mean_c, rid,
        |             ROW_NUMBER() OVER (ORDER BY mean_c, rid) AS rk,
        |             COUNT(*) OVER () AS n_rs
        |           FROM means),
        |pt AS (SELECT SUM(v_c) // COUNT(*) AS point_c FROM daily)
        |SELECT CAST(pt.point_c AS BIGINT) AS point_c,
        |       CAST(MIN(mean_c) AS BIGINT) AS ci_lo_c,
        |       CAST(MAX(mean_c) AS BIGINT) AS ci_hi_c,
        |       CAST(n_rs AS BIGINT) AS n_rs
        |FROM ranked, pt
        |WHERE rk = GREATEST(1, (n_rs * 25 + 999) // 1000)
        |   OR rk = n_rs - GREATEST(1, (n_rs * 25 + 999) // 1000) + 1
        |GROUP BY n_rs, pt.point_c""".stripMargin,

    "q239_dispersion" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 COUNT(*) AS x
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(x) AS BIGINT) AS sx,
        |       CAST((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * 10000
        |            // ((COUNT(*) - 1) * SUM(x)) AS BIGINT) AS d_e4,
        |       (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
        |         > 2 * (COUNT(*) - 1) * SUM(x) AS overdispersed
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
