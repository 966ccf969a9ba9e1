package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Modeling-adjacent analytics (round 9): per-group exact OLS trend
  * fits, value-cutoff RFM segmentation, a selective star join that
  * exercises the broadcast planner the way a BI workload would, and a
  * declarative data-contract audit.
  *
  * Reference intent: the reference fits per-store Prophet models and
  * eyeballs quality in Streamlit
  * (services/training-service/app/train_utils.py:24-35,
  * services/web-ui/app/main.py). The operators here are the SQL-exact versions
  * of the surrounding analytics: trend slopes, user segmentation,
  * revenue cubes, and the ingest-contract gate its Airflow DAG never
  * had. House disciplines throughout — scaled-BIGINT/DECIMAL(38,0)
  * arithmetic with sign-explicit integer division (Spark `div`
  * truncates toward zero, DuckDB `//` floors; on negatives they
  * disagree, so every possibly-negative division goes through
  * sign·(abs div abs), which both engines agree on).
  */
object AnalyticsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G99: per-group exact OLS trend (value vs day index) ────────────
    // Least-squares slope/intercept of daily event value per type, in
    // closed form over integer sums: m = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), all
    // terms DECIMAL(38,0) (y is e6-scaled, x is a small day index).
    // This is U2's trend component re-expressed as ONE declarative
    // aggregate — no per-key iteration, no driver loop: the corpus
    // collapses to |type|×|days| daily cells map-side, the five moment
    // sums partial-aggregate, and the closed form is arithmetic on a
    // |type|-row table. The fit a 1000-executor cluster can run on
    // every key it has.
    "q154_group_ols" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
      val withX = daily.withColumn("x",
        datediff(col("day"),
          min(col("day")).over(Window.partitionBy("event_type"))).cast(LongType))
      withX.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y6").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum(col("x").cast(dec) * col("y6").cast(dec)).as("sxy"))
        .withColumn("num",
          col("n_days").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .withColumn("den",
          col("n_days").cast(dec) * col("sxx") - col("sx") * col("sx"))
        // sign-explicit: num can be negative, den > 0 for n_days >= 2
        .withColumn("slope6", expr(
          "cast(case when num < 0 then -(abs(num) div den) else num div den end as bigint)"))
        .withColumn("t", col("sy") - col("slope6").cast(dec) * col("sx"))
        .withColumn("icept6", expr(
          "cast(case when t < 0 then -(abs(t) div cast(n_days as decimal(38,0))) " +
            "else t div cast(n_days as decimal(38,0)) end as bigint)"))
        .select("event_type", "n_days", "slope6", "icept6")
        .orderBy("event_type")
    }),

    // ── G100: RFM segmentation by exact value cutoffs ──────────────────
    // Recency/frequency/monetary quintiles per user. Deliberately NOT
    // ntile: rank-based quintiles need a global sort per metric (one
    // partition owns every user). Instead the 20/40/60/80 cutpoints are
    // computed as exact percentiles (three tiny aggregates) and each
    // user is bucketed by VALUE comparison — embarrassingly parallel,
    // and the cutpoint table is the reusable artifact a scoring service
    // wants anyway. Buckets can be unequal under ties; that is the
    // documented trade for losing the global sort. Segment code =
    // r·100 + f·10 + m, 1 = best (most recent / most frequent /
    // highest spend after the orientation flips).
    "q155_rfm_segments" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
      val mx = e.agg(max("day").as("mx"))
      val u = e.groupBy("user_id")
        .agg(max("day").as("last_day"), count(lit(1)).as("freq"), sum("v6").as("money6"))
        .crossJoin(broadcast(mx))
        .withColumn("recency", datediff(col("mx"), col("last_day")).cast(LongType))
        .select("user_id", "recency", "freq", "money6")
      val cuts = u.agg(
        expr("percentile(recency, array(0.2, 0.4, 0.6, 0.8))").as("rc"),
        expr("percentile(freq,    array(0.2, 0.4, 0.6, 0.8))").as("fc"),
        expr("percentile(money6,  array(0.2, 0.4, 0.6, 0.8))").as("mc"))
      def bucket(m: String, c: String) = expr(
        s"1 + cast($m > $c[0] as int) + cast($m > $c[1] as int) " +
          s"+ cast($m > $c[2] as int) + cast($m > $c[3] as int)")
      u.crossJoin(broadcast(cuts))
        // recency: smaller = better, so bucket ascending IS the rank;
        // freq/money: larger = better, flip to 6 - bucket
        .withColumn("r", bucket("recency", "rc"))
        .withColumn("f", lit(6) - bucket("freq", "fc"))
        .withColumn("m", lit(6) - bucket("money6", "mc"))
        .withColumn("segment", (col("r") * 100 + col("f") * 10 + col("m")).cast(LongType))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_users"), sum("money6").as("money6_total"))
        .orderBy("segment")
    }),

    // ── G101: selective star join (broadcast-planner showcase) ─────────
    // Revenue by region × order quarter for ONE part brand and ONE
    // order priority — the canonical BI slice. The plan the spec pins:
    // the filtered part dim, customer→nation→region chain ALL broadcast
    // (each far under the threshold after selection); the only shuffle
    // is lineitem⋈orders on orderkey, and AQE sees the selective dims
    // first. Filters reach the parquet scans (PushedFilters on p_brand
    // and o_orderpriority), so the fact table is the only real IO. At
    // 100 TB this is the shape that makes or breaks a warehouse — one
    // wide exchange, everything else map-side.
    "q156_star_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      val p  = Tables.part(s, dir).filter(col("p_brand") === "Brand#12")
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), quarter(col("o_orderdate")).cast(LongType).as("qtr"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(24, 4))).cast(DecimalType(38, 4)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "qtr")
    }),

    // ── G102: declarative data-contract audit ──────────────────────────
    // The ingest gate as a query: one scan of events, five conditional
    // sums (non-negative value, known event type, ts inside the
    // contract window, positive user id, JSON-object props), unpivoted
    // to one row per rule via stack(). Zero-violation rows are emitted
    // too — the audit's job is to prove it LOOKED. At scale this is a
    // single map-side aggregate (no shuffle at all beyond the final
    // 5-row gather), which is why it can run on every ingest batch.
    "q157_contract_audit" -> ((s, dir) => {
      Tables.events(s, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("value") < 0, 1L).otherwise(0L)).as("v_neg"),
          sum(when(!col("event_type").isin(
            "click", "view", "purchase", "signup", "error"), 1L).otherwise(0L)).as("bad_type"),
          sum(when(col("ts") < to_timestamp(lit("2024-01-01")) ||
            col("ts") >= to_timestamp(lit("2025-01-01")), 1L).otherwise(0L)).as("bad_ts"),
          sum(when(col("user_id").isNull || col("user_id") <= 0, 1L).otherwise(0L)).as("bad_user"),
          sum(when(col("props").isNull || !col("props").startsWith("{"), 1L)
            .otherwise(0L)).as("bad_props"))
        .selectExpr("n_rows",
          "stack(5, 'value_nonnegative', v_neg, 'known_event_type', bad_type, " +
            "'ts_in_contract_window', bad_ts, 'positive_user_id', bad_user, " +
            "'props_json_object', bad_props) AS (rule, n_violations)")
        .select("rule", "n_violations", "n_rows")
        .orderBy("rule")
    }),

    // ── G107: log₂-bucket histogram sketch (mergeable, float-free) ─────
    // The fixed-size distribution sketch a 100-TB monitor keeps per
    // key: bucket = ⌊log₂(v6)⌋ computed as length(bin(v6))−1 — pure
    // integer/string ops, so the "log" is exact and identical in both
    // engines (no float log2 at the bucket edge). ≤64 buckets per key,
    // map-side combining, associative merges across any partitioning —
    // the structure behind HdrHistogram-style percentile monitors. The
    // per-bucket (min, max) makes each bucket's range claim auditable.
    "q162_log_histogram" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value") > 0)
        .select(col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
        .withColumn("bucket", (length(expr("bin(v6)")) - 1).cast(LongType))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), min("v6").as("min_v6"), max("v6").as("max_v6"))
        .orderBy("event_type", "bucket")
    }),

    // ── G108: fulfillment-latency distribution (classic BI slice) ──────
    // Days from order to line-item ship, histogrammed per order
    // priority — the operational-latency read every TPC-H-shaped
    // warehouse serves. One fact-fact equi-join (lineitem⋈orders on
    // orderkey, the co-partitionable exchange) then a two-key count;
    // integer datediff, no floats anywhere.
    "q163_ship_latency" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
        .withColumn("lat_days",
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).cast(LongType))
        .groupBy("o_orderpriority", "lat_days")
        .agg(count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority", "lat_days")
    }),

    // ── G109: top-k event trigram mining (sequential patterns) ─────────
    // The 3-step behavioral motifs q115's pairwise transition matrix
    // can't see (A→B→C ≠ A→B plus B→C when the middle step matters).
    // One user_id exchange carries both lead() windows; the trigram
    // count aggregate map-side combines to ≤|types|³ cells regardless
    // of corpus size, then top-20 is a TakeOrdered — no global sort.
    "q164_event_trigrams" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("e2", lead("e1", 1).over(w))
        .withColumn("e3", lead("e1", 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    // ── G110: Horvitz–Thompson estimate audit (sample → population) ────
    // Can the 1-in-10 deterministic hash sample (q75's md5 discipline)
    // stand in for the full scan? The HT estimator inflates each
    // sampled row by 1/p; this audit computes the estimate AND its
    // exact error per event type in one pass over the full table
    // (conditional sums, no second scan). At 100 TB the sample is what
    // dashboards query; err_e4 is the committed accuracy contract, and
    // because the sample is hash-deterministic the audit is exactly
    // reproducible — no RNG to argue with.
    "q165_ht_estimate" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"),
          (expr("conv(substring(md5(cast(event_id as string)), 1, 4), 16, 10)")
            .cast(LongType) % 10).as("h"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum("v6").as("exact_v6"),
          sum(when(col("h") === 0, 1L).otherwise(0L)).as("n_sampled"),
          (sum(when(col("h") === 0, col("v6")).otherwise(0L)) * 10).as("est_v6"))
        .withColumn("err_e4", expr(
          "abs(est_v6 - exact_v6) * 10000 div exact_v6"))
        .select("event_type", "n_rows", "n_sampled", "exact_v6", "est_v6", "err_e4")
        .orderBy("event_type")
    }),

    // ── G111: lag-1 autocorrelation of the daily series (exact sums) ───
    // Is yesterday's volume predictive of today's? Per event type the
    // (x_t, x_{t+1}) pairs come from one lead() window over the ≤|days|
    // daily-count rows; all five moment sums are DECIMAL(38,0)-exact
    // and only the final Pearson formula drops to doubles (ONE
    // deterministic double expression on exact inputs — the q67 rule,
    // so DuckDB reproduces the float bit-for-bit). The whole query
    // costs one map-side daily aggregate + a window over a tiny series.
    "q166_lag_autocorr" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val pairs = daily.withColumn("y", lead("x", 1).over(w))
        .filter(col("y").isNotNull)
      val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
      pairs.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x").cast(DecimalType(19, 0)) * col("y").cast(DecimalType(19, 0))).cast(dec)).as("sxy"),
          sum((col("x").cast(DecimalType(19, 0)) * col("x").cast(DecimalType(19, 0))).cast(dec)).as("sxx"),
          sum((col("y").cast(DecimalType(19, 0)) * col("y").cast(DecimalType(19, 0))).cast(dec)).as("syy"))
        .select(col("event_type"), col("n"),
          ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
              sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
            .as("r_lag1"))
        .orderBy("event_type")
    }),

    // ── G112: CMS join-cardinality estimate audit (sketch dot product) ─
    // Join size |A ⋈ B| = Σ_u cA(u)·cB(u) is what an optimizer needs
    // BEFORE running the join; the count-min inner product
    // min_r Σ_c cmsA[r][c]·cmsB[r][c] estimates it from two 4×1024
    // sketches that never see each other's rows (the shape used when A
    // and B live on different clusters). Both sketch builds are the
    // q143 pipeline (md5-row hashing, map-side cell aggregates); both
    // estimate and exact are integer arithmetic, so the audit row —
    // exact, estimate, overestimate — is oracle-exact. CMS inner
    // products only overestimate; the spec asserts it.
    "q167_join_cardinality_sketch" -> ((s, dir) => {
      val W = 1024
      val e = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val mm = e.agg(min("us").as("lo"), max("us").as("hi"))
      val halves = e.crossJoin(broadcast(mm))
        .withColumn("h", when(col("us") * 2 <= col("lo") + col("hi"), 1).otherwise(2))
        .groupBy("h", "user_id").agg(count(lit(1)).as("cnt"))
      def cms(h: Int) = halves.filter(col("h") === h)
        .withColumn("r", explode(expr("sequence(0, 3)")))
        .withColumn("c",
          conv(substring(md5(concat(col("r").cast(StringType), lit(":"),
            col("user_id").cast(StringType))), 1, 8), 16, 10)
            .cast(LongType) % W)
        .groupBy("r", "c").agg(sum("cnt").as(s"n$h"))
      val exact = halves.filter(col("h") === 1)
        .select(col("user_id"), col("cnt").as("c1"))
        .join(halves.filter(col("h") === 2)
          .select(col("user_id"), col("cnt").as("c2")), Seq("user_id"))
        .agg(coalesce(sum(expr("c1 * c2")), lit(0L)).as("exact_join"))
      val est = cms(1).join(cms(2), Seq("r", "c"))
        .groupBy("r").agg(sum(expr("n1 * n2")).as("dot"))
        .agg(min("dot").as("est_join"))
      exact.crossJoin(est)
        .withColumn("over_n", col("est_join") - col("exact_join"))
        .select("exact_join", "est_join", "over_n")
    }),

    // ── G113: watermark sizing from measured out-of-orderness ──────────
    // How late does this stream actually run? Using arrival order
    // (event_id) per type, delay(e) = max(0, running-max(ts) − ts(e))
    // is each event's lateness behind the high-water mark at its
    // arrival. The p95/p99/max of that distribution IS the watermark a
    // streaming job should declare (q48/q136/q158 currently guess).
    // One (type)-partitioned running-max window + exact percentiles —
    // the measurement that turns 'withWatermark(\"10 minutes\")' from
    // folklore into a fitted number.
    "q168_watermark_sizing" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("hwm", max("us").over(w))
        .withColumn("delay_s", expr("greatest(hwm - us, 0L) div 1000000"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("delay_s") > 0, 1L).otherwise(0L)).as("n_late"),
          expr("percentile(delay_s, 0.95)").as("p95_s"),
          expr("percentile(delay_s, 0.99)").as("p99_s"),
          max("delay_s").as("max_s"))
        .orderBy("event_type")
    }),

    // ── G114: grouped top-k WITH ties (dense_rank semantics) ───────────
    // q04/q135 are row_number top-k (exactly k rows, ties broken); the
    // "top 3 order values per priority, including every order that ties
    // them" read needs dense_rank ≤ k — a different operator: output
    // size is data-dependent and the rank window must see equal values
    // as equal. Same single hash-shuffle window shape as q53; the
    // difference IS the semantics, which the oracle pins.
    "q169_topk_with_ties" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", dense_rank().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .orderBy("o_orderpriority", "rk", "o_orderkey")
    }),

    // ── G115: ratio-to-report (share-of-total within hierarchy) ────────
    // Each nation's share of its region's revenue — the windowed
    // ratio-to-report every BI layer serves. The revenue cube is tiny
    // after aggregation, so the share window costs nothing; shares are
    // e6-scaled integer division over DECIMAL-exact sums (no float
    // ratios), and per-region shares provably sum to ≤ 10⁶ with the
    // floor-rounding remainder (spec-asserted).
    "q170_ratio_to_report" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(24, 4))).cast(DecimalType(38, 4)).as("revenue"))
      val w = Window.partitionBy("r_name")
      rev
        .withColumn("region_revenue", sum("revenue").over(w).cast(DecimalType(38, 4)))
        // exact integer ratio: e4 units lifted to DECIMAL(38,0) so neither
        // engine routes the division through doubles
        .withColumn("share_e6", expr(
          "cast((cast(revenue * 10000 as decimal(38,0)) * 1000000) div " +
            "cast(region_revenue * 10000 as decimal(38,0)) as bigint)"))
        .select("r_name", "n_name", "revenue", "region_revenue", "share_e6")
        .orderBy("r_name", "n_name")
    }),

    // ── G116: Merkle-style bucket reconciliation (anti-entropy) ────────
    // How two replicas of a 100-TB table find their diff without
    // shipping rows: bucket every row by key hash, exchange per-bucket
    // checksums (order-independent SUM of row digests — commutative, so
    // partitioning never matters), recurse only into buckets that
    // disagree. This operator runs one round: the base events table vs
    // a deterministically mutated replica (drop ~1/97 of rows, perturb
    // ~1/89 of values — the corruption fixture), and reports per-bucket
    // row counts + checksum agreement. The bucket fan-out (64) is the
    // tree arity a real anti-entropy protocol tunes.
    "q171_merkle_reconcile" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
      val hmod = (m: Int) => expr(
        s"cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % $m")
      val replica = base
        .filter(hmod(97) =!= 0)
        .withColumn("v6", when(hmod(89) === 0, col("v6") + 1).otherwise(col("v6")))
      def digest(df: DataFrame, n: String, c: String) = df
        .withColumn("bucket", expr("event_id % 64"))
        .withColumn("rh", expr(
          "cast(conv(substring(md5(concat(cast(event_id as string), ':', " +
            "cast(user_id as string), ':', cast(v6 as string))), 1, 12), 16, 10) as bigint)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(n),
          sum(col("rh").cast(DecimalType(38, 0))).as(c))
      digest(base, "n_base", "ck_base")
        .join(digest(replica, "n_replica", "ck_replica"), Seq("bucket"), "full")
        .select(col("bucket"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_replica"), lit(0L)).as("n_replica"),
          (coalesce(col("ck_base"), lit(0).cast(DecimalType(38, 0))) ===
            coalesce(col("ck_replica"), lit(0).cast(DecimalType(38, 0))))
            .as("in_sync"))
        .orderBy("bucket")
    }),

    // ── G117: Theil–Sen robust trend (median of pairwise slopes) ───────
    // q154's OLS snaps to outlier days; the Theil–Sen estimator —
    // median over all pairwise slopes (y_j−y_i)/(x_j−x_i) — shrugs off
    // up to 29% corruption. The pair explosion is per TYPE over the
    // DAILY series (≤|days|² pairs of pre-aggregated rows, not corpus
    // rows), so the self-join is bounded no matter the corpus size.
    // Slopes are e6-scaled with sign-explicit integer division; the
    // median is the one interpolated-percentile double at the end
    // (q13 pairing).
    "q172_theil_sen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y"))
        .withColumn("x",
          datediff(col("day"),
            min(col("day")).over(Window.partitionBy("event_type"))).cast(LongType))
        .select("event_type", "x", "y")
      val a = daily.select(col("event_type"), col("x").as("xi"), col("y").as("yi"))
      val b = daily.select(col("event_type"), col("x").as("xj"), col("y").as("yj"))
      a.join(b, Seq("event_type")).filter(col("xj") > col("xi"))
        .withColumn("s_e6", expr(
          "case when yj - yi < 0 then -((abs(yj - yi) * 1000000) div (xj - xi)) " +
            "else ((yj - yi) * 1000000) div (xj - xi) end"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          expr("percentile(s_e6, 0.5)").as("slope_e6_med"))
        .orderBy("event_type")
    }),

    // ── G104: Z-order layout audit (space-filling-curve clustering) ────
    // The data-layout move that makes multi-dimensional pruning work at
    // 100 TB: interleave the bits of (user_id, day) into a Morton code
    // and cluster files by z-ranges, so a scan filtered on EITHER
    // dimension prunes ~√-proportionally. This operator computes the
    // 32-bit z-value (16 bits per dimension, pure integer bit ops —
    // identical two's-complement semantics in both engines) and audits
    // the locality guarantee per 4096-wide z-bucket: fixing z's high
    // bits fixes both dimensions' high bits, so within a bucket the
    // user span and day span are each provably < 64 (spec-asserted).
    // The per-bucket (min, max) table IS the file-skipping index a
    // writer would persist.
    "q159_zorder_layout" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select((col("user_id").bitwiseAND(65535)).as("x"),
          expr("cast(datediff(cast(ts as date), date'2024-01-01') & 65535 as bigint)").as("y"))
        .withColumn("z", expr(sparkZ("x", "y")))
      e.groupBy(expr("z div 4096").as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_user"), max("x").as("max_user"),
          min("y").as("min_day"), max("y").as("max_day"))
        .orderBy("z_bucket")
    })
  )

  /** Morton interleave of two 16-bit values, Spark SQL dialect
    * (shiftleft/shiftright functions). */
  private def sparkZ(x: String, y: String): String =
    (0 until 16).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})").mkString(" + ")

  /** Same interleave, DuckDB dialect (native shift operators). */
  private def duckZ(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})").mkString(" + ")

  def oracleSql: Map[String, String] = Map(

    "q154_group_ols" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         SUM(CAST(round(value * 1000000) AS BIGINT)) AS y6
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, y6,
        |        datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS x
        |      FROM daily),
        |m AS (SELECT event_type, COUNT(*) AS n_days,
        |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y6 AS HUGEINT)) AS sy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |        SUM(CAST(x AS HUGEINT) * y6) AS sxy
        |      FROM x GROUP BY 1),
        |f AS (SELECT event_type, n_days,
        |        n_days * sxy - sx * sy AS num,
        |        n_days * sxx - sx * sx AS den,
        |        sx, sy
        |      FROM m),
        |g AS (SELECT event_type, n_days, sx, sy,
        |        CASE WHEN num < 0 THEN -(ABS(num) // den) ELSE num // den END AS slope6
        |      FROM f),
        |h AS (SELECT event_type, n_days, slope6,
        |        sy - slope6 * sx AS t
        |      FROM g)
        |SELECT event_type, n_days,
        |       CAST(slope6 AS BIGINT) AS slope6,
        |       CAST(CASE WHEN t < 0 THEN -(ABS(t) // CAST(n_days AS HUGEINT))
        |                 ELSE t // CAST(n_days AS HUGEINT) END AS BIGINT) AS icept6
        |FROM h ORDER BY event_type""".stripMargin,

    "q155_rfm_segments" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |mx AS (SELECT MAX(day) AS mx FROM e),
        |u AS (SELECT user_id,
        |        datediff('day', MAX(day), (SELECT mx FROM mx)) AS recency,
        |        COUNT(*) AS freq, SUM(v6) AS money6
        |      FROM e GROUP BY user_id),
        |cuts AS (SELECT
        |    quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rc,
        |    quantile_cont(freq,    [0.2, 0.4, 0.6, 0.8]) AS fc,
        |    quantile_cont(money6,  [0.2, 0.4, 0.6, 0.8]) AS mc
        |  FROM u),
        |b AS (SELECT user_id, money6,
        |        1 + CAST(recency > rc[1] AS INT) + CAST(recency > rc[2] AS INT)
        |          + CAST(recency > rc[3] AS INT) + CAST(recency > rc[4] AS INT) AS r,
        |        6 - (1 + CAST(freq > fc[1] AS INT) + CAST(freq > fc[2] AS INT)
        |          + CAST(freq > fc[3] AS INT) + CAST(freq > fc[4] AS INT)) AS f,
        |        6 - (1 + CAST(money6 > mc[1] AS INT) + CAST(money6 > mc[2] AS INT)
        |          + CAST(money6 > mc[3] AS INT) + CAST(money6 > mc[4] AS INT)) AS m
        |      FROM u, cuts)
        |SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
        |       COUNT(*) AS n_users,
        |       CAST(SUM(money6) AS BIGINT) AS money6_total
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q156_star_join" ->
      """SELECT r_name, CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |         AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey AND p_brand = 'Brand#12'
        |JOIN orders   ON l_orderkey = o_orderkey
        |                 AND o_orderpriority = '1-URGENT'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, quarter(o_orderdate)
        |ORDER BY r_name, qtr""".stripMargin,

    "q157_contract_audit" ->
      """WITH a AS (SELECT COUNT(*) AS n_rows,
        |    SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS v_neg,
        |    SUM(CASE WHEN event_type NOT IN
        |      ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS bad_type,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
        |          OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END) AS bad_ts,
        |    SUM(CASE WHEN user_id IS NULL OR user_id <= 0 THEN 1 ELSE 0 END) AS bad_user,
        |    SUM(CASE WHEN props IS NULL OR props NOT LIKE '{%' THEN 1 ELSE 0 END) AS bad_props
        |  FROM events)
        |SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_rows FROM (
        |  SELECT 'value_nonnegative' AS rule, v_neg AS n_violations, n_rows FROM a
        |  UNION ALL SELECT 'known_event_type', bad_type, n_rows FROM a
        |  UNION ALL SELECT 'ts_in_contract_window', bad_ts, n_rows FROM a
        |  UNION ALL SELECT 'positive_user_id', bad_user, n_rows FROM a
        |  UNION ALL SELECT 'props_json_object', bad_props, n_rows FROM a)
        |ORDER BY rule""".stripMargin,

    "q172_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 SUM(CAST(round(value * 1000000) AS BIGINT)) AS y
        |               FROM events GROUP BY 1, 2),
        |x AS (SELECT event_type, y,
        |        datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS x
        |      FROM daily),
        |p AS (SELECT a.event_type,
        |        CASE WHEN b.y - a.y < 0
        |             THEN -((ABS(b.y - a.y) * 1000000) // (b.x - a.x))
        |             ELSE ((b.y - a.y) * 1000000) // (b.x - a.x) END AS s_e6
        |      FROM x a JOIN x b ON b.event_type = a.event_type AND b.x > a.x)
        |SELECT event_type, COUNT(*) AS n_pairs,
        |       quantile_cont(s_e6, 0.5) AS slope_e6_med
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q169_topk_with_ties" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC) AS BIGINT) AS rk
        |FROM orders QUALIFY rk <= 3
        |ORDER BY o_orderpriority, rk, o_orderkey""".stripMargin,

    "q170_ratio_to_report" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |           AS DECIMAL(24,4))) AS DECIMAL(38,4)) AS revenue
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |s AS (SELECT r_name, n_name, revenue,
        |        CAST(SUM(revenue) OVER (PARTITION BY r_name) AS DECIMAL(38,4))
        |          AS region_revenue
        |      FROM rev)
        |SELECT r_name, n_name, revenue, region_revenue,
        |       CAST(CAST(revenue * 10000 AS HUGEINT) * 1000000 //
        |         CAST(region_revenue * 10000 AS HUGEINT) AS BIGINT) AS share_e6
        |FROM s ORDER BY r_name, n_name""".stripMargin,

    "q171_merkle_reconcile" ->
      """WITH base AS (SELECT event_id, user_id,
        |                CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |rep AS (SELECT event_id, user_id,
        |          CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |                 AS BIGINT) % 89 = 0 THEN v6 + 1 ELSE v6 END AS v6
        |        FROM base
        |        WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |                AS BIGINT) % 97 <> 0),
        |db AS (SELECT event_id % 64 AS bucket, COUNT(*) AS n_base,
        |         SUM(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
        |           CAST(user_id AS VARCHAR) || ':' || CAST(v6 AS VARCHAR)), 1, 12)
        |           AS BIGINT)) AS ck_base
        |       FROM base GROUP BY 1),
        |dr AS (SELECT event_id % 64 AS bucket, COUNT(*) AS n_replica,
        |         SUM(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
        |           CAST(user_id AS VARCHAR) || ':' || CAST(v6 AS VARCHAR)), 1, 12)
        |           AS BIGINT)) AS ck_replica
        |       FROM rep GROUP BY 1)
        |SELECT COALESCE(db.bucket, dr.bucket) AS bucket,
        |       COALESCE(n_base, 0) AS n_base,
        |       COALESCE(n_replica, 0) AS n_replica,
        |       COALESCE(ck_base, 0) = COALESCE(ck_replica, 0) AS in_sync
        |FROM db FULL JOIN dr ON dr.bucket = db.bucket
        |ORDER BY bucket""".stripMargin,

    "q167_join_cardinality_sketch" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM e),
        |h AS (SELECT user_id, CASE WHEN us*2 <= lo+hi THEN 1 ELSE 2 END AS h,
        |        COUNT(*) AS cnt
        |      FROM e, mm GROUP BY 1, 2),
        |c1 AS (SELECT r,
        |         CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |           CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS c,
        |         CAST(SUM(cnt) AS BIGINT) AS n1
        |       FROM h CROSS JOIN range(4) t(r) WHERE h = 1 GROUP BY 1, 2),
        |c2 AS (SELECT r,
        |         CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |           CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS c,
        |         CAST(SUM(cnt) AS BIGINT) AS n2
        |       FROM h CROSS JOIN range(4) t(r) WHERE h = 2 GROUP BY 1, 2),
        |ex AS (SELECT CAST(COALESCE(SUM(a.cnt * b.cnt), 0) AS BIGINT) AS exact_join
        |       FROM h a JOIN h b ON a.user_id = b.user_id
        |       WHERE a.h = 1 AND b.h = 2),
        |est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est_join FROM (
        |          SELECT c1.r, SUM(n1 * n2) AS dot
        |          FROM c1 JOIN c2 ON c2.r = c1.r AND c2.c = c1.c
        |          GROUP BY 1))
        |SELECT exact_join, est_join, est_join - exact_join AS over_n
        |FROM ex, est""".stripMargin,

    "q168_watermark_sizing" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
        |d AS (SELECT event_type,
        |        GREATEST(MAX(us) OVER (PARTITION BY event_type ORDER BY event_id
        |                               ROWS UNBOUNDED PRECEDING) - us, 0)
        |          // 1000000 AS delay_s
        |      FROM e)
        |SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN delay_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       quantile_cont(delay_s, 0.95) AS p95_s,
        |       quantile_cont(delay_s, 0.99) AS p99_s,
        |       CAST(MAX(delay_s) AS BIGINT) AS max_s
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q164_event_trigrams" ->
      """WITH e AS (SELECT user_id, event_type AS e1, epoch_us(ts) AS us, event_id
        |           FROM events),
        |t AS (SELECT e1,
        |        LEAD(e1, 1) OVER w AS e2, LEAD(e1, 2) OVER w AS e3
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT e1, e2, e3, COUNT(*) AS n FROM t
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "q165_ht_estimate" ->
      """WITH e AS (SELECT event_type,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6,
        |             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)
        |               AS BIGINT) % 10 AS h
        |           FROM events)
        |SELECT event_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |       CAST(SUM(v6) AS BIGINT) AS exact_v6,
        |       CAST(SUM(CASE WHEN h = 0 THEN v6 ELSE 0 END) * 10 AS BIGINT) AS est_v6,
        |       CAST(ABS(SUM(CASE WHEN h = 0 THEN v6 ELSE 0 END) * 10 - SUM(v6))
        |         * 10000 // SUM(v6) AS BIGINT) AS err_e4
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q166_lag_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 COUNT(*) AS x
        |               FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, x,
        |        LEAD(x) OVER (PARTITION BY event_type ORDER BY day) AS y
        |      FROM daily),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |        SUM(CAST(y AS HUGEINT) * y) AS syy
        |      FROM p WHERE y IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_lag1
        |FROM m ORDER BY event_type""".stripMargin,

    "q162_log_histogram" ->
      """WITH v AS (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v6
        |           FROM events WHERE value > 0),
        |b AS (SELECT event_type, v6,
        |        CAST(length(bin(v6)) - 1 AS BIGINT) AS bucket FROM v)
        |SELECT event_type, bucket, COUNT(*) AS n,
        |       MIN(v6) AS min_v6, MAX(v6) AS max_v6
        |FROM b GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,

    "q163_ship_latency" ->
      """SELECT o_orderpriority,
        |       CAST(datediff('day', CAST(o_orderdate AS DATE),
        |         CAST(l_shipdate AS DATE)) AS BIGINT) AS lat_days,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderpriority, lat_days""".stripMargin,

    "q159_zorder_layout" ->
      s"""WITH e AS (SELECT user_id & 65535 AS x,
         |             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) & 65535 AS y
         |           FROM events),
         |z AS (SELECT x, y, ${duckZ("x", "y")} AS z FROM e)
         |SELECT z // 4096 AS z_bucket, COUNT(*) AS n_rows,
         |       MIN(x) AS min_user, MAX(x) AS max_user,
         |       MIN(y) AS min_day, MAX(y) AS max_day
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
