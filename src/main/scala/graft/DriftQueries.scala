package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drift-and-inference wave (round 10, seventy-second wave): exact
  * Wasserstein-1 distance and the DeLong AUC confidence interval.
  *
  * Reference intent: the reference monitors nothing distributional;
  * the drift family here already has the sup-norm (KS, q147) and the
  * L2 statistic (Cramér–von Mises, q424) — q453 completes it with
  * the L1 EARTH-MOVER distance, the metric that reports drift in the
  * UNITS of the variable (cents, here), computed exactly on the
  * distinct-value grain: one packed prefix sum carries (rank, cumA,
  * cumB) through one range-partitioned pass, the inter-value gap
  * comes from an equi-join on consecutive ranks (never a global
  * lead window), and W₁ = Σ|F_A−F_B|·gap lands DECIMAL-lifted with
  * the Jensen certificate W₁ ≥ |mean_A − mean_B| checked exactly.
  * q454 puts the confidence interval on q393's exact AUC (DeLong,
  * DeLong & Clarke-Pearson 1988): the per-observation placement
  * values V₁₀/V₀₁ collapse onto the distinct-score grain (2N·V₁₀ =
  * 2·negBelow + negEqual — midrank tie handling), their weighted
  * variances are n²-scaled DECIMAL moments, Var = S₁₀/P + S₀₁/N at
  * e12, and the single floor-sqrt (q401's one-op rule) yields the
  * standard error; the U-statistic SYMMETRY Σ_pos a·x = Σ_neg b·y is
  * emitted as a certificate, and the spec pins agreement with q393.
  */
object DriftQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G398: exact Wasserstein-1 (earth mover) drift ──────────────────
    // Samples: urgent (priority 1-2) vs rest, order totals in cents —
    // q424's split, so KS/CvM/W1 grade the same drift. Packing
    // budget (documented): rank, cumA, cumB each < 2²¹ — holds to
    // ~2M distinct values / 2M rows per sample; beyond that, split
    // into two prefix-sum passes.
    "q453_wasserstein_drift" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("isa"))
        .groupBy("v")
        .agg(sum("isa").as("ac"), sum(expr("1L - isa")).as("bc"))
        .withColumn("pk", expr("ac + bc * 2097152L + 4398046511104L"))
      val cum = graft.ops.Relational.prefixSum(
        cells, Seq(col("v")), "pk", "cumpk")
        .select(col("v"), col("ac"), col("bc"),
          expr("pmod(cumpk, 2097152L)").as("cuma"),
          expr("pmod(cumpk div 2097152L, 2097152L)").as("cumb"),
          expr("cumpk div 4398046511104L").as("rk"))
      val nxt = cum.select(expr("rk - 1").as("rk"), col("v").as("v2"))
      val tot = cells.agg(sum("ac").as("na"), sum("bc").as("nb"),
        sum(expr("v * ac")).as("sa"), sum(expr("v * bc")).as("sb"),
        count(lit(1)).as("n_values"))
      cum.join(nxt, Seq("rk"))
        .crossJoin(broadcast(tot))
        .agg(max("na").as("na"), max("nb").as("nb"),
          max("n_values").as("n_values"), max("sa").as("sa"), max("sb").as("sb"),
          sum(expr(
            "cast(abs(cuma * nb - cumb * na) as decimal(38, 0)) * (v2 - v)"))
            .as("area"),
          max(expr("abs(cuma * nb - cumb * na)")).as("ks_num"))
        .withColumn("w1_cents_e4", expr(
          "cast(area * 10000 div (cast(na as decimal(38, 0)) * nb) as bigint)"))
        .withColumn("ks_e6", expr(
          "cast(cast(ks_num as decimal(38, 0)) * 1000000 " +
            "div (cast(na as decimal(38, 0)) * nb) as bigint)"))
        // Jensen: W1 >= |mean_A - mean_B|, cross-multiplied exactly:
        // area*1e4 >= |sa*nb - sb*na|*1e4 (common denominator na*nb)
        .withColumn("jensen_ok", expr(
          "case when area >= abs(cast(sa as decimal(38, 0)) * nb " +
            "- cast(sb as decimal(38, 0)) * na) then 1L else 0L end"))
        .withColumn("mean_gap_cents_e4", expr(
          "cast(abs(cast(sa as decimal(38, 0)) * nb - cast(sb as decimal(38, 0)) * na) " +
            "* 10000 div (cast(na as decimal(38, 0)) * nb) as bigint)"))
        .select("na", "nb", "n_values", "w1_cents_e4", "mean_gap_cents_e4",
          "ks_e6", "jensen_ok")
    }),

    // ── G399: DeLong confidence interval on the exact AUC ──────────────
    "q454_delong_auc_ci" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val g = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("sc"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("p"))
        .groupBy("sc").agg(sum("p").as("a"), sum(expr("1 - p")).as("b"))
        .withColumn("pk", expr("b + a * 2147483648L"))
      val cum = graft.ops.Relational.prefixSum(g, Seq(col("sc")), "pk", "cumpk")
        .select(col("sc"), col("a"), col("b"),
          expr("pmod(cumpk, 2147483648L)").as("cumb"),
          expr("cumpk div 2147483648L").as("cuma"))
      val tot = cum.agg(sum("a").as("pp"), sum("b").as("nn"),
        count(lit(1)).as("n_scores"))
      // placement values on the cell grain: x = 2N·V10, y = 2P·V01
      val stats = cum.crossJoin(broadcast(tot))
        .withColumn("x", expr("2 * (cumb - b) + b"))
        .withColumn("y", expr("2 * (pp - cuma) + a"))
        .agg(max("pp").as("pp"), max("nn").as("nn"),
          max("n_scores").as("n_scores"),
          sum(expr(s"cast(a as $dec) * x")).as("u2"),
          sum(expr(s"cast(b as $dec) * y")).as("u2n"),
          sum(expr(s"cast(a as $dec) * x * x")).as("sx2"),
          sum(expr(s"cast(b as $dec) * y * y")).as("sy2"))
      stats
        .withColumn("auc_e6", expr(
          s"cast(u2 * 1000000 div (cast(pp as $dec) * nn * 2) as bigint)"))
        .withColumn("u_symmetric", expr(
          "case when u2 = u2n then 1L else 0L end"))
        // SSx = P·Σa·x² − (Σa·x)²  (n²-scaled weighted variance)
        // Var·1e12 = SSx·1e12 div (P²(P−1)·4N²) + SSy·1e12 div (N²(N−1)·4P²)
        .withColumn("var_e12", expr(
          s"""cast((pp * sx2 - u2 * u2) * 1000000000000
             |   div (cast(pp as $dec) * pp * (pp - 1) * 4 * nn * nn)
             | + (nn * sy2 - u2n * u2n) * 1000000000000
             |   div (cast(nn as $dec) * nn * (nn - 1) * 4 * pp * pp)
             | as bigint)""".stripMargin))
        .withColumn("se_e6", expr(
          "cast(floor(sqrt(cast(var_e12 as double))) as bigint)"))
        .withColumn("ci_lo_e6", expr(
          "greatest(0L, auc_e6 - 196 * se_e6 div 100)"))
        .withColumn("ci_hi_e6", expr(
          "least(1000000L, auc_e6 + 196 * se_e6 div 100)"))
        .select("pp", "nn", "n_scores", "auc_e6", "u_symmetric", "var_e12",
          "se_e6", "ci_lo_e6", "ci_hi_e6")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q453_wasserstein_drift" ->
      """WITH cells AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
        |    SUM(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |        THEN 1 ELSE 0 END) AS ac,
        |    SUM(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |        THEN 0 ELSE 1 END) AS bc
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT v, ac, bc,
        |    SUM(ac) OVER w AS cuma, SUM(bc) OVER w AS cumb,
        |    ROW_NUMBER() OVER (ORDER BY v) AS rk,
        |    LEAD(v) OVER (ORDER BY v) AS v2
        |  FROM cells WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT SUM(ac) AS na, SUM(bc) AS nb,
        |    SUM(v * ac) AS sa, SUM(v * bc) AS sb,
        |    COUNT(*) AS n_values FROM cells),
        |agg AS (SELECT
        |    SUM(CAST(ABS(cuma * nb - cumb * na) AS HUGEINT) * (v2 - v))
        |      AS area,
        |    MAX(ABS(cuma * nb - cumb * na)) AS ks_num
        |  FROM cum, tot WHERE v2 IS NOT NULL)
        |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(n_values AS BIGINT) AS n_values,
        |  CAST(area * 10000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
        |    AS w1_cents_e4,
        |  CAST(ABS(CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
        |    * 10000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
        |    AS mean_gap_cents_e4,
        |  CAST(CAST(ks_num AS HUGEINT) * 1000000 // (CAST(na AS HUGEINT) * nb)
        |    AS BIGINT) AS ks_e6,
        |  CAST(CASE WHEN area >= ABS(CAST(sa AS HUGEINT) * nb
        |    - CAST(sb AS HUGEINT) * na) THEN 1 ELSE 0 END AS BIGINT)
        |    AS jensen_ok
        |FROM agg, tot""".stripMargin,

    "q454_delong_auc_ci" ->
      """WITH g AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
        |    SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 1 ELSE 0 END) AS a,
        |    SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 0 ELSE 1 END) AS b
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT sc, a, b,
        |    SUM(a) OVER w AS cuma, SUM(b) OVER w AS cumb
        |  FROM g WINDOW w AS (ORDER BY sc ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT SUM(a) AS pp, SUM(b) AS nn, COUNT(*) AS n_scores
        |        FROM g),
        |st AS (SELECT pp, nn, n_scores,
        |    SUM(CAST(a AS HUGEINT) * (2 * (cumb - b) + b)) AS u2,
        |    SUM(CAST(b AS HUGEINT) * (2 * (pp - cuma) + a)) AS u2n,
        |    SUM(CAST(a AS HUGEINT) * (2 * (cumb - b) + b)
        |        * (2 * (cumb - b) + b)) AS sx2,
        |    SUM(CAST(b AS HUGEINT) * (2 * (pp - cuma) + a)
        |        * (2 * (pp - cuma) + a)) AS sy2
        |  FROM cum, tot GROUP BY pp, nn, n_scores),
        |de AS (SELECT pp, nn, n_scores,
        |    CAST(u2 * 1000000 // (CAST(pp AS HUGEINT) * nn * 2) AS BIGINT)
        |      AS auc_e6,
        |    CASE WHEN u2 = u2n THEN 1 ELSE 0 END AS u_symmetric,
        |    CAST((pp * sx2 - u2 * u2) * 1000000000000
        |        // (CAST(pp AS HUGEINT) * pp * (pp - 1) * 4 * nn * nn)
        |      + (nn * sy2 - u2n * u2n) * 1000000000000
        |        // (CAST(nn AS HUGEINT) * nn * (nn - 1) * 4 * pp * pp)
        |      AS BIGINT) AS var_e12
        |  FROM st)
        |SELECT CAST(pp AS BIGINT) AS pp, CAST(nn AS BIGINT) AS nn,
        |  CAST(n_scores AS BIGINT) AS n_scores, auc_e6,
        |  CAST(u_symmetric AS BIGINT) AS u_symmetric, var_e12,
        |  CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE))) AS BIGINT) AS se_e6,
        |  CAST(GREATEST(0, auc_e6
        |    - 196 * CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE))) AS BIGINT)
        |      // 100) AS BIGINT) AS ci_lo_e6,
        |  CAST(LEAST(1000000, auc_e6
        |    + 196 * CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE))) AS BIGINT)
        |      // 100) AS BIGINT) AS ci_hi_e6
        |FROM de""".stripMargin
  )
}
