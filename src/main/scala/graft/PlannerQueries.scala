package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Planner-statistics operators (round 9, thirteenth wave): the
  * cost-based-optimizer inputs — equi-depth histograms, most-common-
  * value lists, partition pruning — each stated as an oracle-gated
  * audit that measures the estimator against ground truth ON the
  * engine's own data.
  *
  * Reference intent: the reference trusts Postgres's planner
  * statistics implicitly (every SQLAlchemy query in
  * services/web-ui/app/db_utils.py); at 100 TB the planner's
  * histogram/NDV/pruning quality IS the difference between a
  * seconds-plan and an hours-plan, so the engine should be able to
  * compute — and audit — its own statistics as first-class queries.
  * Together with q218 (NDV correlation) these are the CBO family.
  */
object PlannerQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G169: equi-depth histogram range-selectivity audit ─────────────
    // Build a 16-bucket equi-depth histogram over o_totalprice (ntile
    // over a totally-ordered sort — (price, orderkey) tiebreak makes
    // bucket assignment deterministic), then score the estimator the
    // way a CBO would use it: for the range predicate
    // [100000, 250000) the estimate per bucket is n_b scaled by the
    // linear-interpolation overlap fraction of [min_b, max_b] with the
    // range (uniformity-within-bucket assumption), in exact cents/e6
    // integers; the actual is counted per bucket in the same pass.
    // The output ledger est-vs-act per bucket is the audit a stats
    // refresh job would alert on. Bucketing is Relational.distributedNtile
    // — range-repartition + partition-major contiguous ids + the exact
    // NTILE size formula — NOT `ntile() OVER (ORDER BY …)`, whose
    // unpartitioned window would sort the whole fact table in ONE task;
    // bit-identical output, every stage parallel. One 16-row aggregate
    // after.
    "q224_histogram_selectivity" -> ((s, dir) => {
      val lo = 10000000L; val hi = 25000000L // cents: [100k, 250k)
      val base = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"),
          col("o_orderkey"))
      val v = graft.ops.Relational.distributedNtile(base,
          Seq(col("v_c").asc, col("o_orderkey").asc), 16,
          base.agg(count(lit(1)).as("n_total")), "bucket")
        .withColumn("bucket", col("bucket").cast(LongType))
      v.groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("v_c").as("lo_c"), max("v_c").as("hi_c"),
          sum(when(col("v_c") >= lo && col("v_c") < hi, 1L).otherwise(0L))
            .as("act_in_range"))
        .withColumn("est_in_range", expr(
          s"""CASE WHEN hi_c < $lo OR lo_c >= $hi THEN 0
             |     WHEN hi_c = lo_c THEN n_rows
             |     ELSE n_rows * (least(hi_c, $hi - 1) - greatest(lo_c, $lo))
             |          div (hi_c - lo_c) END""".stripMargin))
        .select("bucket", "n_rows", "lo_c", "hi_c", "est_in_range", "act_in_range")
        .orderBy("bucket")
    }),

    // ── G170: MCV equality-selectivity audit (stats-list estimator) ────
    // The planner's second statistic: a top-10 most-common-values list
    // over l_partkey plus the uniform-residual rule for everything
    // else — est(key) = freq(key) if key ∈ MCV else
    // (N − Σmcv) div (NDV − 10). Scored against ALL keys at once (not
    // a point probe): per key |est − act|, aggregated by MCV
    // membership. The two-row ledger (in_mcv true/false) is exactly
    // the residual-skew signal that tells a DBA the MCV list is too
    // short. Plan: one groupBy(partkey) aggregate (map-side combine),
    // top-10 via ONE TakeOrdered on the key-count table, broadcast
    // back; scalars (N, NDV, mcv_mass) ride a 1-row broadcast.
    "q225_mcv_selectivity" -> ((s, dir) => {
      val freq = Tables.lineitem(s, dir)
        .groupBy("l_partkey").agg(count(lit(1)).as("act"))
      val mcv = freq.orderBy(col("act").desc, col("l_partkey").asc).limit(10)
        .select(col("l_partkey"), col("act").as("mcv_freq"))
      val scalars = freq.agg(sum("act").as("n_total"),
        count(lit(1)).as("ndv"))
        .crossJoin(mcv.agg(sum("mcv_freq").as("mcv_mass")))
      freq.join(broadcast(mcv), Seq("l_partkey"), "left")
        .crossJoin(broadcast(scalars))
        .withColumn("in_mcv", col("mcv_freq").isNotNull)
        .withColumn("est", when(col("in_mcv"), col("mcv_freq"))
          .otherwise(expr("(n_total - mcv_mass) div (ndv - 10)")))
        .groupBy("in_mcv")
        .agg(count(lit(1)).as("n_keys"),
          sum("act").as("sum_act"), sum("est").as("sum_est"),
          sum(expr("abs(est - act)")).as("sum_abs_err"))
        .orderBy("in_mcv")
    }),

    // ── G171: partition-pruning audit (month-partitioned layout) ───────
    // Land orders partitioned by month (the layout every 100-TB fact
    // table ships with), read back with a 6-month predicate, and emit
    // the per-month ledger (rows, files touched). The point the audit
    // proves: the month filter is satisfied by DIRECTORY pruning —
    // PartitionFilters in the scan, non-matching files never opened —
    // and because the writer repartitions by month first, each month
    // is exactly ONE file (n_files=1 is the layout contract, the
    // small-files discipline q211 proves for ranges). input_file_name
    // counts physical provenance from inside the query itself.
    "q226_partition_pruning" -> ((s, dir) => {
      val months = Seq("1996-01", "1996-02", "1996-03", "1996-04", "1996-05", "1996-06")
      val path = PipelineQueries.cachedFixture(s"prune|$dir") { work =>
        Tables.orders(s, dir)
          .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
          .repartition(col("month"))
          .write.partitionBy("month").mode("overwrite").parquet(s"$work/bymonth")
      } + "/bymonth"
      s.read.parquet(path)
        .filter(col("month").isin(months: _*))
        .withColumn("fn", input_file_name()) // projected, then aggregated
        .groupBy("month")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("fn")).as("n_files"))
        .orderBy("month")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q224_histogram_selectivity" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v_c,
        |             o_orderkey FROM orders),
        |b AS (SELECT v_c, CAST(NTILE(16) OVER (ORDER BY v_c, o_orderkey) AS BIGINT)
        |        AS bucket FROM v),
        |a AS (SELECT bucket, COUNT(*) AS n_rows, MIN(v_c) AS lo_c, MAX(v_c) AS hi_c,
        |        SUM(CASE WHEN v_c >= 10000000 AND v_c < 25000000 THEN 1 ELSE 0 END)
        |          AS act_in_range
        |      FROM b GROUP BY bucket)
        |SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows, lo_c, hi_c,
        |       CAST(CASE WHEN hi_c < 10000000 OR lo_c >= 25000000 THEN 0
        |                 WHEN hi_c = lo_c THEN n_rows
        |                 ELSE n_rows * (LEAST(hi_c, 24999999) - GREATEST(lo_c, 10000000))
        |                      // (hi_c - lo_c) END AS BIGINT)
        |         AS est_in_range,
        |       CAST(act_in_range AS BIGINT) AS act_in_range
        |FROM a ORDER BY bucket""".stripMargin,

    "q225_mcv_selectivity" ->
      """WITH freq AS (SELECT l_partkey, COUNT(*) AS act FROM lineitem GROUP BY l_partkey),
        |mcv AS (SELECT l_partkey, act AS mcv_freq FROM freq
        |        ORDER BY act DESC, l_partkey LIMIT 10),
        |s AS (SELECT (SELECT SUM(act) FROM freq) AS n_total,
        |             (SELECT COUNT(*) FROM freq) AS ndv,
        |             (SELECT SUM(mcv_freq) FROM mcv) AS mcv_mass),
        |j AS (SELECT f.l_partkey, f.act, m.mcv_freq IS NOT NULL AS in_mcv,
        |        CASE WHEN m.mcv_freq IS NOT NULL THEN m.mcv_freq
        |             ELSE (s.n_total - s.mcv_mass) // (s.ndv - 10) END AS est
        |      FROM freq f LEFT JOIN mcv m USING (l_partkey), s)
        |SELECT in_mcv, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(act) AS BIGINT) AS sum_act,
        |       CAST(SUM(est) AS BIGINT) AS sum_est,
        |       CAST(SUM(ABS(est - act)) AS BIGINT) AS sum_abs_err
        |FROM j GROUP BY in_mcv ORDER BY in_mcv""".stripMargin,

    "q226_partition_pruning" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS n_files
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') IN
        |  ('1996-01','1996-02','1996-03','1996-04','1996-05','1996-06')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
