package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Reconciliation and sampling-design operators (round 9,
  * twenty-fourth wave): the join-semantics matrix, cross-table revenue
  * reconciliation, and systematic PPS sampling with its
  * Horvitz-Thompson audit.
  *
  * Reference intent: the reference joins one way (inner, by key —
  * db_utils.py) and trusts its totals; a warehouse team reconciles
  * fact-to-header money nightly and samples with unequal
  * probabilities when full scans are too dear. Exact integers.
  */
object ReconQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G209: join-semantics matrix (every join type, one census) ──────
    // The row-count algebra of customer⋈orders under all six join
    // types, as ONE table: inner, left, right, full, semi, anti —
    // plus the distinct matched keys both ways. Each count derives
    // from a single (custkey-grain) pre-aggregate of both sides (the
    // shuffle carries two tiny key tables, never the fact rows), and
    // the identities the spec asserts (full = left + right − inner,
    // left = inner + left_anti...) are the contracts every downstream
    // query silently assumes.
    "q264_join_matrix" -> ((s, dir) => {
      val c = Tables.customer(s, dir).groupBy(col("c_custkey").as("k"))
        .agg(count(lit(1)).as("nc"))
      val o = Tables.orders(s, dir).groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("no"))
      val m = c.join(o, Seq("k"), "full_outer")
        .agg(
          sum(when(col("nc").isNotNull && col("no").isNotNull,
            col("nc") * col("no")).otherwise(0L)).as("inner_rows"),
          sum(when(col("nc").isNotNull,
            col("nc") * coalesce(col("no"), lit(1L))).otherwise(0L)).as("left_rows"),
          sum(when(col("no").isNotNull,
            coalesce(col("nc"), lit(1L)) * col("no")).otherwise(0L)).as("right_rows"),
          sum(when(col("nc").isNotNull && col("no").isNotNull, 1L)
            .otherwise(0L)).as("semi_keys"),
          sum(when(col("nc").isNotNull && col("no").isNull, col("nc"))
            .otherwise(0L)).as("anti_rows"),
          sum(when(col("nc").isNotNull && col("no").isNull, 1L)
            .otherwise(0L)).as("cust_only_keys"),
          sum(when(col("nc").isNull && col("no").isNotNull, 1L)
            .otherwise(0L)).as("order_only_keys"))
        .withColumn("full_rows",
          expr("left_rows + right_rows - inner_rows"))
      m.select("inner_rows", "left_rows", "right_rows", "full_rows",
        "semi_keys", "anti_rows", "cust_only_keys", "order_only_keys")
    }),

    // ── G210: fact-to-header revenue reconciliation ────────────────────
    // The nightly warehouse check: does Σ line revenue (extendedprice
    // ·(1−discount)·(1+tax), exact e4 cents via scaled-integer
    // products) reconcile to the order header's total? The mismatch
    // distribution — bucketed by relative error e4 — is the ledger
    // that catches silent fact/header drift. One lineitem aggregate
    // (map-side combine on orderkey) + one broadcast-free equi-join to
    // headers + a |buckets|-row census. On synthetic data the
    // mismatches are real and the census proves the pipeline MEASURES
    // them rather than assuming consistency.
    "q265_reconciliation" -> ((s, dir) => {
      val lines = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("k"),
          // cents·e4: price_c × (104 − disc_e4) × (104 + tax_e4)
          expr("""cast(round(l_extendedprice * 100) as bigint) *
                 |  (10000 - cast(round(l_discount * 10000) as bigint)) *
                 |  (10000 + cast(round(l_tax * 10000) as bigint))""".stripMargin).as("rev_e8"))
        .groupBy("k").agg(sum("rev_e8").as("line_rev_e8"))
      val hdr = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint) * 100000000").as("hdr_e8"))
      hdr.join(lines, Seq("k"), "left")
        .withColumn("line_rev_e8", coalesce(col("line_rev_e8"), lit(0L)))
        // rel error on the CENTS grain (e8·10⁴ would overflow BIGINT)
        .withColumn("abs_err_c", expr("abs(line_rev_e8 - hdr_e8) div 100000000"))
        .withColumn("rel_err_e4", expr(
          "abs_err_c * 10000 div greatest(hdr_e8 div 100000000, 1)"))
        .withColumn("bucket", expr(
          """case when rel_err_e4 = 0 then 'exact'
            |     when rel_err_e4 <= 100 then 'within_1pct'
            |     when rel_err_e4 <= 1000 then 'within_10pct'
            |     else 'divergent' end""".stripMargin))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("hdr_e8 div 100000000")).as("hdr_c"),
          max("rel_err_e4").as("worst_e4"))
        .orderBy("bucket")
    }),

    // ── G211: systematic PPS sampling + Horvitz-Thompson audit ─────────
    // Unequal-probability sampling without an RNG: sort orders by a
    // deterministic key (md5), take the cumulative cents weight, and
    // select every row whose cumulative interval crosses a multiple of
    // step = W/n (systematic PPS, n = 200) — big orders are
    // near-certain picks, small ones proportional. Inclusion probability π = min(1, w·n/W)
    // exact e6; the HT estimator Σ v/π audits itself against the true
    // total (err_e4 emitted). Systematic sampling needs a GLOBAL prefix
    // sum — the scale-safe form is Relational.prefixSum (range-
    // repartition on the md5 key, per-partition partial sums, broadcast
    // partition offsets), never `SUM() OVER (ORDER BY …)`'s single-task
    // window; the grand total rides a broadcast 1-row aggregate. π_e6
    // is floor-divided, so adversarially tiny weights (w·n·1e6 < W)
    // could floor it to 0 — Spark `div` would yield NULL (silently
    // dropping the HT term) while DuckDB `//` errors; greatest(pi_e6,1)
    // pins both engines to the same defined value (a no-op at any
    // TPC-H scale, where every weight clears the floor). q165's
    // Bernoulli design has variance ~1/p — systematic PPS kills it
    // for skewed money data, and the ledger SHOWS that.
    "q266_systematic_pps" -> ((s, dir) => {
      val n = 200L
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("w"))
        .withColumn("h", md5(col("k").cast("string")))
      val cum = graft.ops.Relational.prefixSum(base, Seq(col("h")), "w", "cum")
        .crossJoin(broadcast(base.agg(sum("w").as("tot"))))
        .withColumn("step", expr(s"tot div $n"))
        .withColumn("picked", expr("cum div step > (cum - w) div step"))
      val sampled = cum.filter(col("picked"))
        .withColumn("pi_e6", least(lit(1000000L), expr(s"w * $n * 1000000 div tot")))
        .withColumn("ht_term", expr("w * 1000000 div greatest(pi_e6, 1)"))
      sampled.agg(count(lit(1)).as("n_sampled"),
          sum("ht_term").as("ht_total_c"),
          max("tot").as("true_total_c"))
        .withColumn("err_e4", expr(
          "abs(ht_total_c - true_total_c) * 10000 div true_total_c"))
    }),

    // ── G218: Neyman allocation of a sampling budget (q273) ────────────
    // q125/q145 split budgets EQUALLY or proportionally; the optimal
    // (variance-minimizing) design allocates n_h ∝ N_h·σ_h. The whole
    // computation stays engine-exact: N_h·σ_h = sqrt(N_h·Σy² − (Σy)²)
    // (the population-variance numerator — one sqrt per STRATUM, on a
    // DECIMAL exactly converted to double, identical IEEE sqrt/floor in
    // both engines), and the 1000-unit budget lands by floor-division
    // plus largest-remainder rounding (rank over the ~|months| stratum
    // rows — pre-aggregated, never corpus grain), so Σ alloc == budget
    // EXACTLY. One fact-table aggregate; everything after is arithmetic
    // on the month-level frame.
    "q273_neyman_allocation" -> ((s, dir) => {
      val b = 1000L
      val st = Tables.orders(s, dir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("stratum"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
        .groupBy("stratum")
        .agg(count(lit(1)).as("nh"), sum("y").as("sy"),
          sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      val w = st
        .withColumn("v", expr(
          "cast(nh as decimal(38,0)) * syy - cast(sy as decimal(38,0)) * sy"))
        .withColumn("w", expr("cast(floor(sqrt(cast(v as double))) as bigint)"))
      val based = w.crossJoin(broadcast(w.agg(sum("w").as("tw"))))
        .withColumn("base", expr(s"$b * w div tw"))
        .withColumn("rem", expr(s"($b * w) % tw"))
      based.crossJoin(broadcast(based.agg((lit(b) - sum("base")).as("k"))))
        .withColumn("rnk", row_number().over(
          boundedGlobalRank(col("rem").desc, col("stratum").asc)).cast(LongType))
        .withColumn("alloc", col("base") + when(col("rnk") <= col("k"), 1L).otherwise(0L))
        .select("stratum", "nh", "w", "alloc")
        .orderBy("stratum")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q264_join_matrix" ->
      """WITH c AS (SELECT c_custkey AS k, COUNT(*) AS nc FROM customer GROUP BY 1),
        |o AS (SELECT o_custkey AS k, COUNT(*) AS no FROM orders GROUP BY 1),
        |f AS (SELECT c.nc, o.no FROM c FULL OUTER JOIN o USING (k)),
        |m AS (SELECT
        |  SUM(CASE WHEN nc IS NOT NULL AND no IS NOT NULL THEN nc * no ELSE 0 END)
        |    AS inner_rows,
        |  SUM(CASE WHEN nc IS NOT NULL THEN nc * COALESCE(no, 1) ELSE 0 END)
        |    AS left_rows,
        |  SUM(CASE WHEN no IS NOT NULL THEN COALESCE(nc, 1) * no ELSE 0 END)
        |    AS right_rows,
        |  SUM(CASE WHEN nc IS NOT NULL AND no IS NOT NULL THEN 1 ELSE 0 END)
        |    AS semi_keys,
        |  SUM(CASE WHEN nc IS NOT NULL AND no IS NULL THEN nc ELSE 0 END)
        |    AS anti_rows,
        |  SUM(CASE WHEN nc IS NOT NULL AND no IS NULL THEN 1 ELSE 0 END)
        |    AS cust_only_keys,
        |  SUM(CASE WHEN nc IS NULL AND no IS NOT NULL THEN 1 ELSE 0 END)
        |    AS order_only_keys
        |  FROM f)
        |SELECT CAST(inner_rows AS BIGINT) AS inner_rows,
        |       CAST(left_rows AS BIGINT) AS left_rows,
        |       CAST(right_rows AS BIGINT) AS right_rows,
        |       CAST(left_rows + right_rows - inner_rows AS BIGINT) AS full_rows,
        |       CAST(semi_keys AS BIGINT) AS semi_keys,
        |       CAST(anti_rows AS BIGINT) AS anti_rows,
        |       CAST(cust_only_keys AS BIGINT) AS cust_only_keys,
        |       CAST(order_only_keys AS BIGINT) AS order_only_keys
        |FROM m""".stripMargin,

    "q265_reconciliation" ->
      """WITH lines AS (SELECT l_orderkey AS k,
        |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (10000 - CAST(round(l_discount * 10000) AS BIGINT)) *
        |        (10000 + CAST(round(l_tax * 10000) AS BIGINT))) AS line_rev_e8
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT o_orderkey AS k,
        |        CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 AS hdr_e8
        |      FROM orders),
        |j AS (SELECT h.k, h.hdr_e8, COALESCE(lines.line_rev_e8, 0) AS line_rev_e8
        |      FROM h LEFT JOIN lines USING (k)),
        |e AS (SELECT *, (ABS(line_rev_e8 - hdr_e8) // 100000000) * 10000
        |        // GREATEST(hdr_e8 // 100000000, 1) AS rel_err_e4 FROM j)
        |SELECT CASE WHEN rel_err_e4 = 0 THEN 'exact'
        |            WHEN rel_err_e4 <= 100 THEN 'within_1pct'
        |            WHEN rel_err_e4 <= 1000 THEN 'within_10pct'
        |            ELSE 'divergent' END AS bucket,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(hdr_e8 // 100000000) AS BIGINT) AS hdr_c,
        |       CAST(MAX(rel_err_e4) AS BIGINT) AS worst_e4
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q266_systematic_pps" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS w
        |           FROM orders),
        |c AS (SELECT k, w,
        |        SUM(w) OVER (ORDER BY md5(CAST(k AS VARCHAR))
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        SUM(w) OVER () AS tot
        |      FROM b),
        |s AS (SELECT *, tot // 200 AS step FROM c),
        |p AS (SELECT *, CAST(LEAST(1000000, w * 200 * 1000000 // tot) AS BIGINT)
        |        AS pi_e6
        |      FROM s WHERE cum // step > (cum - w) // step)
        |SELECT COUNT(*) AS n_sampled,
        |       CAST(SUM(w * 1000000 // GREATEST(pi_e6, 1)) AS BIGINT) AS ht_total_c,
        |       CAST(MAX(tot) AS BIGINT) AS true_total_c,
        |       CAST(ABS(SUM(w * 1000000 // GREATEST(pi_e6, 1)) - MAX(tot)) * 10000
        |            // MAX(tot) AS BIGINT) AS err_e4
        |FROM p""".stripMargin,

    "q273_neyman_allocation" ->
      """WITH s AS (SELECT strftime(o_orderdate, '%Y-%m') AS stratum,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS y
        |           FROM orders),
        |st AS (SELECT stratum, COUNT(*) AS nh, SUM(y) AS sy,
        |         SUM(CAST(y AS HUGEINT) * y) AS syy
        |       FROM s GROUP BY stratum),
        |w AS (SELECT *,
        |        CAST(FLOOR(SQRT(CAST(CAST(nh AS HUGEINT) * syy
        |          - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS BIGINT) AS w
        |      FROM st),
        |t AS (SELECT SUM(w) AS tw FROM w),
        |b AS (SELECT stratum, nh, w, 1000 * w // tw AS base, (1000 * w) % tw AS rem
        |      FROM w, t),
        |k AS (SELECT 1000 - SUM(base) AS k FROM b),
        |r AS (SELECT b.*, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rnk, k.k
        |      FROM b, k)
        |SELECT stratum, CAST(nh AS BIGINT) AS nh, CAST(w AS BIGINT) AS w,
        |       CAST(base + CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY stratum""".stripMargin
  )
}
