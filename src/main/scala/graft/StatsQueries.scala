package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog-statistics subsystem (round 10, thirty-seventh wave): the
  * ANALYZE pass, the mergeable-stats identity, stats staleness
  * detection, and equi-width histograms — completing the CBO feed
  * alongside q218 (NDV correlation), q224/q225 (equi-depth + MCV
  * selectivity) and q318 (estimator feedback).
  *
  * Reference intent: the reference trusts Postgres autovacuum to keep
  * stats fresh; a lake has no autovacuum — stats are TABLES this
  * engine must build, merge incrementally, and know when to rebuild.
  * All exact integers in long format (one row per column), every
  * number oracle-mirrored.
  */
object StatsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G266: ANALYZE pass (per-column stats in one scan) ──────────────
    // The stats table a CBO reads: for each orders column — NDV
    // (exact), null count, min/max (as canonical strings so one long
    // schema carries every type). ONE scan computes all columns'
    // stats via parallel aggregates; at 1e12 rows the NDVs swap to
    // HLL (q49's path) and everything else stays exact — min/max/
    // null-count are single-pass mergeable by nature.
    "q321_analyze_stats" -> ((s, dir) => {
      // spread: the 6-distinct-aggregate Expand (×7 row fan-out) and its
      // partial aggregation otherwise run inside the single-row-group
      // scan's one task (guide §2.5) — measured 3.3 s of a 4.4 s query
      val o = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("o_totalprice_c"),
        to_date(col("o_orderdate")).as("o_orderdate"))
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_totalprice_c", "o_orderdate")
      val agg = o.agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          countDistinct(col(c)).as(s"ndv_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nul_$c"),
          min(col(c)).cast(StringType).as(s"min_$c"),
          max(col(c)).cast(StringType).as(s"max_$c"))): _*)
      agg.select(explode(array(cols.map(c => struct(
          lit(c).as("column_name"), col("n_rows"),
          col(s"ndv_$c").as("ndv"), col(s"nul_$c").as("n_null"),
          col(s"min_$c").as("min_str"), col(s"max_$c").as("max_str"))): _*)).as("e"))
        .select("e.*")
        .orderBy("column_name")
    }),

    // ── G267: mergeable-stats identity (incremental ANALYZE) ───────────
    // Split orders into two md5 halves, compute each half's stats,
    // MERGE (count/null add, min/max fold, NDV brackets), and certify
    // against the full-table stats: additive and fold stats must match
    // EXACTLY; NDV must satisfy max(a,b) ≤ full ≤ a+b (the bound that
    // justifies incremental maintenance until a real sketch merge is
    // needed). This is the algebra that lets a 100-TB lake ANALYZE
    // only the partitions that changed.
    "q322_stats_merge" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v2"))
        .withColumn("half", expr(
          "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 4), 16, 10) as bigint) % 2"))
      def statsOf(df: DataFrame) = df.agg(count(lit(1)).as("n"),
        countDistinct("o_custkey").as("ndv_cust"),
        min("v2").as("min_v2"), max("v2").as("max_v2"))
      val a = statsOf(o.filter(col("half") === 0))
        .select(col("n").as("n_a"), col("ndv_cust").as("ndv_a"),
          col("min_v2").as("min_a"), col("max_v2").as("max_a"))
      val b = statsOf(o.filter(col("half") === 1))
        .select(col("n").as("n_b"), col("ndv_cust").as("ndv_b"),
          col("min_v2").as("min_b"), col("max_v2").as("max_b"))
      val full = statsOf(o)
      a.crossJoin(b).crossJoin(full)
        .select(
          col("n_a"), col("n_b"), col("ndv_a"), col("ndv_b"),
          (col("n_a") + col("n_b") === col("n")).as("count_merges"),
          (least(col("min_a"), col("min_b")) === col("min_v2")).as("min_merges"),
          (greatest(col("max_a"), col("max_b")) === col("max_v2")).as("max_merges"),
          (greatest(col("ndv_a"), col("ndv_b")) <= col("ndv_cust") &&
            col("ndv_cust") <= col("ndv_a") + col("ndv_b")).as("ndv_bracketed"),
          col("ndv_cust").as("ndv_full"))
    }),

    // ── G268: stats staleness detector (when to re-ANALYZE) ────────────
    // Stats computed on the OLD snapshot (orders before anchor−30d —
    // anchor from the data) vs the full current table: row-count, NDV
    // and max drift at e4, and the rebuild flag (any drift beyond 10%).
    // A CBO running on the stale stats mis-estimates by exactly these
    // factors — the drift TABLE is the evidence that q318's calibration
    // has expired.
    "q323_stats_staleness" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v2"))
      val anchor = o.agg(date_sub(max("d"), 30).as("cutoff"))
      val withCut = o.crossJoin(broadcast(anchor))
      def statsOf(df: DataFrame, tag: String) = df.agg(
        count(lit(1)).as(s"n_$tag"), countDistinct("o_custkey").as(s"ndv_$tag"),
        max("v2").as(s"max_$tag"))
      val old = statsOf(withCut.filter(col("d") <= col("cutoff")), "old")
      val cur = statsOf(o, "cur")
      old.crossJoin(cur)
        .select(col("n_old"), col("n_cur"), col("ndv_old"), col("ndv_cur"),
          col("max_old"), col("max_cur"),
          expr("(n_cur - n_old) * 10000 div greatest(n_old, 1)").as("rows_drift_e4"),
          expr("(ndv_cur - ndv_old) * 10000 div greatest(ndv_old, 1)").as("ndv_drift_e4"),
          expr("(max_cur - max_old) * 10000 div greatest(abs(max_old), 1)").as("max_drift_e4"))
        .withColumn("rebuild", expr(
          "rows_drift_e4 > 1000 or ndv_drift_e4 > 1000 or abs(max_drift_e4) > 1000"))
    }),

    // ── G269: equi-width histogram (the other CBO histogram) ───────────
    // q224's equi-depth buckets answer range selectivity; equi-WIDTH
    // buckets (20 fixed-width bins over [min, max]) answer skew: a
    // bin holding 30% of rows is the MCV region, empty bins are the
    // gaps partition pruning exploits. Bin = (v−min)·20 div (max−min+1)
    // — pure arithmetic on the broadcast domain row, one scan, exact
    // counts; emitted dense (empty bins present via a 20-row spine).
    "q324_equiwidth_hist" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v2"))
      val dom = v.agg(min("v2").as("vmin"), max("v2").as("vmax"))
      val binned = v.crossJoin(broadcast(dom))
        .withColumn("bin", expr("(v2 - vmin) * 20 div (vmax - vmin + 1)"))
        .groupBy("bin").agg(count(lit(1)).as("n_rows"),
          min("v2").as("bin_min"), max("v2").as("bin_max"))
      val spine = s.range(0, 20).select(col("id").as("bin"))
      val tot = v.agg(count(lit(1)).as("n_total"))
      spine.join(binned, Seq("bin"), "left")
        .na.fill(0L, Seq("n_rows"))
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("n_rows"),
          expr("n_rows * 10000 div n_total").as("share_e4"),
          col("bin_min"), col("bin_max"))
        .orderBy("bin")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q321_analyze_stats" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_c,
        |             CAST(o_orderdate AS DATE) AS o_orderdate
        |           FROM orders),
        |s AS (
        |  SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
        |    COUNT(DISTINCT o_orderkey) AS ndv,
        |    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_null,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS max_str FROM o
        |  UNION ALL SELECT 'o_custkey', COUNT(*), COUNT(DISTINCT o_custkey),
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM o
        |  UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus),
        |    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
        |    MIN(o_orderstatus), MAX(o_orderstatus) FROM o
        |  UNION ALL SELECT 'o_orderpriority', COUNT(*), COUNT(DISTINCT o_orderpriority),
        |    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
        |    MIN(o_orderpriority), MAX(o_orderpriority) FROM o
        |  UNION ALL SELECT 'o_totalprice_c', COUNT(*), COUNT(DISTINCT o_totalprice_c),
        |    SUM(CASE WHEN o_totalprice_c IS NULL THEN 1 ELSE 0 END),
        |    CAST(MIN(o_totalprice_c) AS VARCHAR), CAST(MAX(o_totalprice_c) AS VARCHAR) FROM o
        |  UNION ALL SELECT 'o_orderdate', COUNT(*), COUNT(DISTINCT o_orderdate),
        |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
        |    CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR) FROM o)
        |SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(ndv AS BIGINT) AS ndv, CAST(n_null AS BIGINT) AS n_null,
        |       min_str, max_str
        |FROM s ORDER BY column_name""".stripMargin,

    "q322_stats_merge" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS v2,
        |             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT) % 2 AS half
        |           FROM orders),
        |a AS (SELECT COUNT(*) AS n_a, COUNT(DISTINCT o_custkey) AS ndv_a,
        |             MIN(v2) AS min_a, MAX(v2) AS max_a FROM o WHERE half = 0),
        |b AS (SELECT COUNT(*) AS n_b, COUNT(DISTINCT o_custkey) AS ndv_b,
        |             MIN(v2) AS min_b, MAX(v2) AS max_b FROM o WHERE half = 1),
        |f AS (SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS ndv_cust,
        |             MIN(v2) AS min_v2, MAX(v2) AS max_v2 FROM o)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST(ndv_a AS BIGINT) AS ndv_a, CAST(ndv_b AS BIGINT) AS ndv_b,
        |       n_a + n_b = n AS count_merges,
        |       LEAST(min_a, min_b) = min_v2 AS min_merges,
        |       GREATEST(max_a, max_b) = max_v2 AS max_merges,
        |       GREATEST(ndv_a, ndv_b) <= ndv_cust AND ndv_cust <= ndv_a + ndv_b AS ndv_bracketed,
        |       CAST(ndv_cust AS BIGINT) AS ndv_full
        |FROM a, b, f""".stripMargin,

    "q323_stats_staleness" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS v2 FROM orders),
        |a AS (SELECT MAX(d) - 30 AS cutoff FROM o),
        |old AS (SELECT COUNT(*) AS n_old, COUNT(DISTINCT o_custkey) AS ndv_old,
        |               MAX(v2) AS max_old FROM o, a WHERE d <= cutoff),
        |cur AS (SELECT COUNT(*) AS n_cur, COUNT(DISTINCT o_custkey) AS ndv_cur,
        |               MAX(v2) AS max_cur FROM o)
        |SELECT CAST(n_old AS BIGINT) AS n_old, CAST(n_cur AS BIGINT) AS n_cur,
        |       CAST(ndv_old AS BIGINT) AS ndv_old, CAST(ndv_cur AS BIGINT) AS ndv_cur,
        |       max_old, max_cur,
        |       CAST((n_cur - n_old) * 10000 // GREATEST(n_old, 1) AS BIGINT) AS rows_drift_e4,
        |       CAST((ndv_cur - ndv_old) * 10000 // GREATEST(ndv_old, 1) AS BIGINT) AS ndv_drift_e4,
        |       CAST((max_cur - max_old) * 10000 // GREATEST(abs(max_old), 1) AS BIGINT) AS max_drift_e4,
        |       (n_cur - n_old) * 10000 // GREATEST(n_old, 1) > 1000
        |         OR (ndv_cur - ndv_old) * 10000 // GREATEST(ndv_old, 1) > 1000
        |         OR abs((max_cur - max_old) * 10000 // GREATEST(abs(max_old), 1)) > 1000 AS rebuild
        |FROM old, cur""".stripMargin,

    "q324_equiwidth_hist" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v2 FROM orders),
        |d AS (SELECT MIN(v2) AS vmin, MAX(v2) AS vmax FROM v),
        |b AS (SELECT (v2 - vmin) * 20 // (vmax - vmin + 1) AS bin, v2 FROM v, d),
        |g AS (SELECT bin, COUNT(*) AS n_rows, MIN(v2) AS bin_min, MAX(v2) AS bin_max
        |      FROM b GROUP BY bin),
        |sp AS (SELECT UNNEST(range(0, 20)) AS bin),
        |t AS (SELECT COUNT(*) AS n_total FROM v)
        |SELECT CAST(sp.bin AS BIGINT) AS bin,
        |       CAST(COALESCE(n_rows, 0) AS BIGINT) AS n_rows,
        |       CAST(COALESCE(n_rows, 0) * 10000 // n_total AS BIGINT) AS share_e4,
        |       bin_min, bin_max
        |FROM sp LEFT JOIN g ON sp.bin = g.bin, t
        |ORDER BY bin""".stripMargin
  )
}
