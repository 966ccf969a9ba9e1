package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experimentation-platform analytics (round 10, thirty-fourth wave):
  * Welch's t² with cleared denominators, CUPED variance reduction,
  * quantile treatment effects, and a daily sample-ratio-mismatch
  * guardrail.
  *
  * Reference intent: the reference has no experimentation surface;
  * these are the four ops every A/B platform runs on exactly the
  * event/order tables this library certifies. House determinism
  * throughout: every statistic is a ratio of integer moment sums with
  * denominators cleared (one documented floor where a staged division
  * is needed to stay inside DECIMAL(38,0)); significance thresholds
  * are exact integer cross-multiplications against 1.96² = 3.8416.
  */
object ExperimentQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G254: Welch's t² (unequal-variance two-sample test) ────────────
    // Does purchase value differ from click value? The fully-cleared
    // rational t² = (S₁n₂−S₂n₁)²(n₁−1)(n₂−1)/[An₂²(n₂−1)+Bn₁²(n₁−1)]
    // outruns DECIMAL(38,0) at corpus n, so the statistic is STAGED
    // with three documented floors mirrored verbatim by DuckDB:
    //   msq_e4  = (S₁n₂−S₂n₁)²·1e4 div (n₁n₂)²        [(m₁−m₂)² at e4]
    //   se2_e8  = A·1e8 div n₁²(n₁−1) + B·1e8 div n₂²(n₂−1)
    //   t2_e4   = msq_e4·1e8 div se2_e8
    // with A = n₁Q₁−S₁² (n-scaled CSS; units are whole dollars so the
    // widest product stays ≲1e34 through n ≈ 1e6 per arm). Cell-scale
    // work: one grouped moment pass, a 2-row pivot.
    "q309_welch_t2" -> ((s, dir) => {
      val m = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), round(col("value")).cast(LongType).as("v0"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v0").as("sx"),
          sum(expr("cast(v0 as decimal(38,0)) * v0")).as("q"))
      val p = m.agg(
        max(when(col("event_type") === "purchase", col("n"))).as("n1"),
        max(when(col("event_type") === "purchase", col("sx"))).as("s1"),
        max(when(col("event_type") === "purchase", col("q"))).as("q1"),
        max(when(col("event_type") === "click", col("n"))).as("n2"),
        max(when(col("event_type") === "click", col("sx"))).as("s2"),
        max(when(col("event_type") === "click", col("q"))).as("q2"))
      p.withColumn("a", expr("n1 * q1 - cast(s1 as decimal(38,0)) * s1"))
        .withColumn("b", expr("n2 * q2 - cast(s2 as decimal(38,0)) * s2"))
        .withColumn("dnum", expr("cast(s1 as decimal(38,0)) * n2 - cast(s2 as decimal(38,0)) * n1"))
        .withColumn("msq_e4", expr(
          "dnum * dnum * 10000 div (cast(n1 as decimal(38,0)) * n2 * n1 * n2)"))
        .withColumn("se2_e8", expr(
          """a * 100000000 div (cast(n1 as decimal(38,0)) * n1 * (n1 - 1))
            | + b * 100000000 div (cast(n2 as decimal(38,0)) * n2 * (n2 - 1))""".stripMargin))
        .select(col("n1"), col("n2"),
          expr("s1 div n1").as("mean1_d"), expr("s2 div n2").as("mean2_d"),
          expr("cast(msq_e4 * 100000000 div greatest(se2_e8, 1) as bigint)").as("t2_e4"))
        .withColumn("significant_95", expr("t2_e4 > 38416"))
    }),

    // ── G255: CUPED variance reduction (pre-period covariate) ──────────
    // The experimentation platform's favorite trick: adjust the post-
    // period metric by the pre-period covariate, cutting variance by
    // exactly ρ². Split at anchor−15d (anchor = max event day — the
    // FIXTURES determinism rule, never wall clock); per user x = pre
    // count, y = post count; θ = cov/var(x) (sign-explicit floor —
    // covariance can be negative) and the variance-reduction share
    // ρ²_e6 = cov²·1e6 div (var_x·var_y), all n-scaled integer
    // moments. One user aggregate + one 1-row moment pass.
    "q310_cuped" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
      val anchor = e.agg(max("day").as("maxd"))
      val xy = e.crossJoin(broadcast(anchor))
        .groupBy("user_id")
        .agg(sum(when(col("day") <= date_sub(col("maxd"), 15), 1L).otherwise(0L)).as("x"),
          sum(when(col("day") > date_sub(col("maxd"), 15), 1L).otherwise(0L)).as("y"))
      xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
          sum(expr("x * y")).as("sxy"))
        .withColumn("cov_n", expr("n * sxy - sx * sy"))
        .withColumn("varx_n", expr("n * sxx - sx * sx"))
        .withColumn("vary_n", expr("n * syy - sy * sy"))
        .select(col("n").as("n_users"),
          expr("case when cov_n >= 0 then cov_n * 1000000 div varx_n " +
            "else -((-cov_n) * 1000000 div varx_n) end").as("theta_e6"),
          expr("cast(cast(cov_n as decimal(38,0)) * cov_n * 1000000 div " +
            "(cast(varx_n as decimal(38,0)) * vary_n) as bigint)").as("rho2_e6"),
          col("varx_n"), col("vary_n"))
    }),

    // ── G256: quantile treatment effect (decile-wise, nearest-rank) ────
    // Means hide distributional shifts; the QTE table shows WHERE the
    // two groups differ: for urgent vs low-priority orders, the exact
    // nearest-rank decile values (rank = ⌈k·n/10⌉ — q208's discrete
    // semantics, partitioned windows only) and their difference, per
    // decile. An effect concentrated in the top deciles is a tail
    // effect no t-test sees.
    "q311_qte" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderpriority").as("grp"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v2"),
          col("o_orderkey"))
      val ranked = o
        .withColumn("rnk", row_number().over(
          Window.partitionBy("grp").orderBy(col("v2").asc, col("o_orderkey").asc)))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("grp")))
      val ks = s.range(1, 10).select(col("id").as("k"))
      val hits = ranked.join(broadcast(ks),
          col("rnk") === expr("(k * cnt + 9) div 10"))
        .groupBy("k")
        .agg(min(when(col("grp") === "1-URGENT", col("v2"))).as("p_urgent_c"),
          min(when(col("grp") === "5-LOW", col("v2"))).as("p_low_c"))
      hits.select(col("k"), col("p_urgent_c"), col("p_low_c"),
          (col("p_urgent_c") - col("p_low_c")).as("qte_c"))
        .orderBy("k")
    }),

    // ── G257: daily sample-ratio-mismatch guardrail (χ², exact) ────────
    // Assignment = md5(user) mod 2 (the deterministic 50/50 the
    // platform intends); per day, the one-df χ² = (n_a−n_b)²/(n_a+n_b)
    // tested against 3.8416 by integer cross-multiplication
    // (10000·(n_a−n_b)² > 38416·(n_a+n_b)). A flagged day means the
    // logging pipeline, not the experiment, is broken — the guardrail
    // runs BEFORE any effect readout is trusted. Daily-cell work.
    "q312_srm_daily" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"),
          expr("cast(conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10) as bigint) % 2")
            .as("arm"))
        .groupBy("day")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("chi2_e4", expr(
          "(n_a - n_b) * (n_a - n_b) * 10000 div (n_a + n_b)"))
        .withColumn("srm_flag", expr(
          "10000 * (n_a - n_b) * (n_a - n_b) > 38416 * (n_a + n_b)"))
        .orderBy("day")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q309_welch_t2" ->
      """WITH m AS (SELECT event_type, COUNT(*) AS n,
        |             SUM(CAST(round(value) AS BIGINT)) AS sx,
        |             SUM(CAST(CAST(round(value) AS BIGINT) AS HUGEINT)
        |                 * CAST(round(value) AS BIGINT)) AS q
        |           FROM events WHERE event_type IN ('purchase', 'click')
        |           GROUP BY event_type),
        |p AS (SELECT
        |        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        |        MAX(CASE WHEN event_type = 'purchase' THEN sx END) AS s1,
        |        MAX(CASE WHEN event_type = 'purchase' THEN q END) AS q1,
        |        MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
        |        MAX(CASE WHEN event_type = 'click' THEN sx END) AS s2,
        |        MAX(CASE WHEN event_type = 'click' THEN q END) AS q2
        |      FROM m),
        |c AS (SELECT n1, n2, s1, s2,
        |        n1 * q1 - CAST(s1 AS HUGEINT) * s1 AS a,
        |        n2 * q2 - CAST(s2 AS HUGEINT) * s2 AS b,
        |        CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 AS dnum
        |      FROM p),
        |d AS (SELECT *,
        |        dnum * dnum * 10000 // (CAST(n1 AS HUGEINT) * n2 * n1 * n2) AS msq_e4,
        |        a * 100000000 // (CAST(n1 AS HUGEINT) * n1 * (n1 - 1))
        |          + b * 100000000 // (CAST(n2 AS HUGEINT) * n2 * (n2 - 1)) AS se2_e8
        |      FROM c)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |       CAST(s1 // n1 AS BIGINT) AS mean1_d,
        |       CAST(s2 // n2 AS BIGINT) AS mean2_d,
        |       CAST(msq_e4 * 100000000 // GREATEST(se2_e8, 1) AS BIGINT) AS t2_e4,
        |       msq_e4 * 100000000 // GREATEST(se2_e8, 1) > 38416 AS significant_95
        |FROM d""".stripMargin,

    "q310_cuped" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |a AS (SELECT MAX(day) AS maxd FROM e),
        |xy AS (SELECT user_id,
        |         SUM(CASE WHEN day <= maxd - 15 THEN 1 ELSE 0 END) AS x,
        |         SUM(CASE WHEN day > maxd - 15 THEN 1 ELSE 0 END) AS y
        |       FROM e, a GROUP BY user_id),
        |mo AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |       FROM xy),
        |c AS (SELECT n, n*sxy - sx*sy AS cov_n, n*sxx - sx*sx AS varx_n,
        |             n*syy - sy*sy AS vary_n FROM mo)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |       CAST(CASE WHEN cov_n >= 0 THEN cov_n * 1000000 // varx_n
        |            ELSE -((-cov_n) * 1000000 // varx_n) END AS BIGINT) AS theta_e6,
        |       CAST(CAST(cov_n AS HUGEINT) * cov_n * 1000000
        |            // (CAST(varx_n AS HUGEINT) * vary_n) AS BIGINT) AS rho2_e6,
        |       CAST(varx_n AS BIGINT) AS varx_n, CAST(vary_n AS BIGINT) AS vary_n
        |FROM c""".stripMargin,

    "q311_qte" ->
      """WITH o AS (SELECT o_orderpriority AS grp,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v2, o_orderkey
        |           FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v2, o_orderkey) AS rnk,
        |             COUNT(*) OVER (PARTITION BY grp) AS cnt
        |      FROM o),
        |k AS (SELECT UNNEST(range(1, 10)) AS k),
        |h AS (SELECT k.k,
        |        MIN(CASE WHEN grp = '1-URGENT' THEN v2 END) AS p_urgent_c,
        |        MIN(CASE WHEN grp = '5-LOW' THEN v2 END) AS p_low_c
        |      FROM r JOIN k ON rnk = (k.k * cnt + 9) // 10
        |      GROUP BY k.k)
        |SELECT CAST(k AS BIGINT) AS k, p_urgent_c, p_low_c,
        |       p_urgent_c - p_low_c AS qte_c
        |FROM h ORDER BY k""".stripMargin,

    "q312_srm_daily" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2 AS arm
        |           FROM events),
        |g AS (SELECT day,
        |        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
        |        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b
        |      FROM d GROUP BY day)
        |SELECT day, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST((n_a - n_b) * (n_a - n_b) * 10000 // (n_a + n_b) AS BIGINT) AS chi2_e4,
        |       10000 * (n_a - n_b) * (n_a - n_b) > 38416 * (n_a + n_b) AS srm_flag
        |FROM g ORDER BY day""".stripMargin
  )
}
