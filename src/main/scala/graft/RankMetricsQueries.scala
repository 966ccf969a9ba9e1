package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranking-metrics subsystem (round 10, fifty-fifth wave): exact ROC
  * AUC by rank-sum, exact average precision, Cohen's kappa, and the
  * rank-correlation pair (Spearman ρ + Kendall τ) — the classifier /
  * ranker evaluation layer the reference never computes (its
  * forecast-service reports only point-error metrics,
  * services/forecast-service/app/main.py).
  *
  * All four are exact-integer: AUC is the Mann-Whitney identity on the
  * SCORE grain (never a per-row global sort — score-grain negative
  * counts prefix-summed by ops/Relational.prefixSum's two-phase
  * range-repartition + broadcast-offset pass, the scale-safe form);
  * average precision packs (is-positive, 1) into one BIGINT so ONE
  * prefix sum yields both cum-positives and rank; kappa reuses
  * distributedNtile for the data-anchored median cut (exactly NTILE(2)
  * semantics, no global window); the correlation pair runs entirely on
  * the |nation| aggregate grain with ranks from strict-less pair
  * counts (no window at all).
  */
object RankMetricsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G338: exact ROC AUC (Mann-Whitney rank-sum, score grain) ───────
    // Label: urgent/high priority; score: order value in cents. With
    // ties handled by the average-rank convention, AUC·2·P·N =
    // Σ_scores 2·np(s)·negBelow(s) + np(s)·nn(s) — computable entirely
    // at the distinct-score grain. negBelow comes from prefixSum
    // (range-repartition, per-partition partials, broadcast offsets):
    // no unpartitioned window anywhere. The final ratio lifts to
    // DECIMAL(38,0) because P·N overflows BIGINT near 3·10⁹ rows.
    "q393_roc_auc" -> ((s, dir) => {
      val g = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("sc"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("p"))
        .groupBy("sc").agg(sum("p").as("np"), sum(expr("1 - p")).as("nn"))
      val cum = graft.ops.Relational.prefixSum(g, Seq(col("sc")), "nn", "cumneg")
      cum.agg(
          sum("np").as("n_pos"), sum("nn").as("n_neg"),
          count(lit(1)).as("n_scores"),
          sum(expr("2 * np * (cumneg - nn) + np * nn")).as("u2"))
        .withColumn("auc_e6", expr(
          "cast(cast(u2 as decimal(38,0)) * 1000000" +
            " div (cast(n_pos as decimal(38,0)) * n_neg * 2) as bigint)"))
    }),

    // ── G339: exact average precision (packed single prefix sum) ───────
    // Ranking by (score desc, key asc) — a total order, so AP is
    // deterministic. The trick: pack v = p·2⁴⁰ + 1 per row; ONE
    // inclusive prefix sum then carries cum_pos in the high bits and
    // the 1-based rank in the low bits simultaneously (rank < 2⁴⁰
    // rows by the packing budget). precision@hit = cum_pos·10⁶ div
    // rank at each positive row, AP = the mean — each term floors
    // once, documented.
    "q394_average_precision" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("sc"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("p"))
        .withColumn("v", expr("p * 1099511627776L + 1L"))
      val cum = graft.ops.Relational.prefixSum(
        base, Seq(col("sc").desc, col("k")), "v", "cumv")
      cum.filter(col("p") === 1L)
        .withColumn("cum_pos", expr("cumv div 1099511627776L"))
        .withColumn("rk", expr("cumv % 1099511627776L"))
        .withColumn("prec_e6", expr("cum_pos * 1000000 div rk"))
        .agg(count(lit(1)).as("n_pos"), max("rk").as("deepest_hit_rank"),
          sum("prec_e6").as("sum_prec_e6"))
        .withColumn("ap_e6", expr("sum_prec_e6 div n_pos"))
    }),

    // ── G340: Cohen's kappa (chance-corrected rater agreement) ─────────
    // Two deterministic "raters" on each order: A = above-median order
    // value, B = above-median basket size (lineitem count), both cuts
    // data-anchored via distributedNtile(2) on the tie-broken total
    // order (value, key) — exactly NTILE(2), no global window. κ·10⁶ =
    // (n·(a+d) − E)·10⁶ div (n² − E) with E = (a+b)(a+c)+(c+d)(b+d),
    // lifted to DECIMAL(38,0) (n² overflows BIGINT past 3·10⁹ orders).
    // Inner join: only orders with lineitems are rated (documented).
    "q395_cohens_kappa" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val b = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("k2")).agg(count(lit(1)).as("nli"))
      val joined = o.join(b, col("k") === col("k2")).select("k", "cents", "nli")
      val nT = joined.agg(count(lit(1)).as("n_total"))
      val ra = graft.ops.Relational.distributedNtile(
        joined, Seq(col("cents"), col("k")), 2, nT, "ra")
      val rb = graft.ops.Relational.distributedNtile(
        ra, Seq(col("nli"), col("k")), 2, nT, "rb")
      rb.agg(
          sum(when(col("ra") === 2 && col("rb") === 2, 1L).otherwise(0L)).as("a"),
          sum(when(col("ra") === 2 && col("rb") === 1, 1L).otherwise(0L)).as("b"),
          sum(when(col("ra") === 1 && col("rb") === 2, 1L).otherwise(0L)).as("c"),
          sum(when(col("ra") === 1 && col("rb") === 1, 1L).otherwise(0L)).as("d"))
        .withColumn("n", expr("a + b + c + d"))
        .withColumn("agree_e6", expr("(a + d) * 1000000 div n"))
        .withColumn("kappa_e6", expr(
          "cast((cast(n as decimal(38,0)) * (a + d)" +
            " - (cast(a as decimal(38,0)) + b) * (a + c)" +
            " - (cast(c as decimal(38,0)) + d) * (b + d)) * 1000000" +
            " div (cast(n as decimal(38,0)) * n" +
            " - (cast(a as decimal(38,0)) + b) * (a + c)" +
            " - (cast(c as decimal(38,0)) + d) * (b + d)) as bigint)"))
    }),

    // ── G341: Spearman ρ + Kendall τ (nation-grain rank correlation) ───
    // Two per-nation metrics — lineitem revenue and line volume —
    // ranked on the tie-broken total orders (metric, nationkey); ranks
    // come from strict-less PAIR COUNTS on the |nation|² self-join
    // (625 pairs — no window, not even a small one). ρ·10⁶ = 10⁶ −
    // 6·10⁶·Σd² div n(n²−1) is exact (no ties by construction);
    // τ_a·10⁶ = (C−D)·2·10⁶ div n(n−1) from the concordance census on
    // the same pair join. Dimension-grain throughout after one corpus
    // aggregate.
    "q396_rank_correlation" -> ((s, dir) => {
      val m = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nk"))
        .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("rev"),
          count(lit(1)).as("vol"))
      val m2 = m.select(col("nk").as("nk2"), col("rev").as("rev2"), col("vol").as("vol2"))
      val ranks = m.join(broadcast(m2), col("nk") =!= col("nk2"))
        .groupBy("nk")
        .agg(sum(when(col("rev2") < col("rev") ||
            (col("rev2") === col("rev") && col("nk2") < col("nk")), 1L)
            .otherwise(0L)).as("lessA"),
          sum(when(col("vol2") < col("vol") ||
            (col("vol2") === col("vol") && col("nk2") < col("nk")), 1L)
            .otherwise(0L)).as("lessB"))
        .select(col("nk"), (col("lessA") + 1).as("ra"), (col("lessB") + 1).as("rb"))
      val r2 = ranks.select(col("nk").as("nk2"), col("ra").as("ra2"), col("rb").as("rb2"))
      val kd = ranks.join(broadcast(r2), col("nk") < col("nk2"))
        .agg(sum(when((col("ra") < col("ra2")) === (col("rb") < col("rb2")), 1L)
            .otherwise(0L)).as("conc"),
          sum(when((col("ra") < col("ra2")) =!= (col("rb") < col("rb2")), 1L)
            .otherwise(0L)).as("disc"))
      ranks.agg(count(lit(1)).as("n"),
          sum(expr("(ra - rb) * (ra - rb)")).as("sum_d2"))
        .crossJoin(kd)
        .withColumn("rho_e6", expr("1000000 - 6000000 * sum_d2 div (n * (n*n - 1))"))
        .withColumn("tau_e6", expr("(conc - disc) * 2000000 div (n * (n - 1))"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q393_roc_auc" ->
      """WITH b AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
        |             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                  THEN 1 ELSE 0 END AS p
        |           FROM orders),
        |g AS (SELECT sc, SUM(p) AS np, SUM(1 - p) AS nn FROM b GROUP BY sc),
        |c AS (SELECT *, SUM(nn) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cumneg
        |      FROM g)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |       CAST(SUM(nn) AS BIGINT) AS n_neg,
        |       CAST(COUNT(*) AS BIGINT) AS n_scores,
        |       CAST(SUM(2 * np * (cumneg - nn) + np * nn) AS BIGINT) AS u2,
        |       CAST(CAST(SUM(2 * np * (cumneg - nn) + np * nn) AS HUGEINT) * 1000000
        |            // (CAST(SUM(np) AS HUGEINT) * SUM(nn) * 2) AS BIGINT) AS auc_e6
        |FROM c""".stripMargin,

    "q394_average_precision" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
        |             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                  THEN 1 ELSE 0 END AS p
        |           FROM orders),
        |w AS (SELECT k, p,
        |        SUM(p) OVER (ORDER BY sc DESC, k ROWS UNBOUNDED PRECEDING) AS cum_pos,
        |        ROW_NUMBER() OVER (ORDER BY sc DESC, k) AS rk
        |      FROM b),
        |pos AS (SELECT cum_pos, rk, cum_pos * 1000000 // rk AS prec_e6
        |        FROM w WHERE p = 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
        |       CAST(MAX(rk) AS BIGINT) AS deepest_hit_rank,
        |       CAST(SUM(prec_e6) AS BIGINT) AS sum_prec_e6,
        |       CAST(SUM(prec_e6) // COUNT(*) AS BIGINT) AS ap_e6
        |FROM pos""".stripMargin,

    "q395_cohens_kappa" ->
      """WITH j AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |             COUNT(*) AS nli
        |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |           GROUP BY o_orderkey, o_totalprice),
        |r AS (SELECT k, NTILE(2) OVER (ORDER BY cents, k) AS ra,
        |        NTILE(2) OVER (ORDER BY nli, k) AS rb
        |      FROM j),
        |cell AS (SELECT
        |    SUM(CASE WHEN ra = 2 AND rb = 2 THEN 1 ELSE 0 END) AS a,
        |    SUM(CASE WHEN ra = 2 AND rb = 1 THEN 1 ELSE 0 END) AS b,
        |    SUM(CASE WHEN ra = 1 AND rb = 2 THEN 1 ELSE 0 END) AS c,
        |    SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS d
        |  FROM r)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |       CAST(a + b + c + d AS BIGINT) AS n,
        |       CAST((a + d) * 1000000 // (a + b + c + d) AS BIGINT) AS agree_e6,
        |       CAST((CAST(a + b + c + d AS HUGEINT) * (a + d)
        |             - CAST(a + b AS HUGEINT) * (a + c)
        |             - CAST(c + d AS HUGEINT) * (b + d)) * 1000000
        |            // (CAST(a + b + c + d AS HUGEINT) * (a + b + c + d)
        |             - CAST(a + b AS HUGEINT) * (a + c)
        |             - CAST(c + d AS HUGEINT) * (b + d)) AS BIGINT) AS kappa_e6
        |FROM cell""".stripMargin,

    "q396_rank_correlation" ->
      """WITH m AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev,
        |             COUNT(*) AS vol
        |           FROM lineitem
        |             JOIN orders ON l_orderkey = o_orderkey
        |             JOIN customer ON o_custkey = c_custkey
        |           GROUP BY c_nationkey),
        |ranks AS (SELECT x.nk,
        |    1 + SUM(CASE WHEN y.rev < x.rev OR (y.rev = x.rev AND y.nk < x.nk)
        |                 THEN 1 ELSE 0 END) AS ra,
        |    1 + SUM(CASE WHEN y.vol < x.vol OR (y.vol = x.vol AND y.nk < x.nk)
        |                 THEN 1 ELSE 0 END) AS rb
        |  FROM m x JOIN m y ON x.nk != y.nk GROUP BY x.nk),
        |kd AS (SELECT
        |    SUM(CASE WHEN (x.ra < y.ra) = (x.rb < y.rb) THEN 1 ELSE 0 END) AS conc,
        |    SUM(CASE WHEN (x.ra < y.ra) != (x.rb < y.rb) THEN 1 ELSE 0 END) AS disc
        |  FROM ranks x JOIN ranks y ON x.nk < y.nk),
        |sp AS (SELECT COUNT(*) AS n, SUM((ra - rb) * (ra - rb)) AS sum_d2 FROM ranks)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
        |       CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
        |       CAST(1000000 - 6000000 * sum_d2 // (n * (n*n - 1)) AS BIGINT) AS rho_e6,
        |       CAST((conc - disc) * 2000000 // (n * (n - 1)) AS BIGINT) AS tau_e6
        |FROM sp, kd""".stripMargin
  )
}
