package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seasonal-state and sequence subsystem (round 10, forty-ninth wave):
  * Holt–Winters additive smoothing as a list-state fold, PrefixSpan-lite
  * ordered-subsequence mining, a clustering-depth layout audit, and the
  * MASE forecast metric.
  *
  * Reference intent: Prophet's whole pitch is trend+seasonality state
  * (services/training-service/app/train_utils.py:24-35); Holt–Winters
  * is the classical state-space form of exactly that, and q369 lands it
  * under the house fold discipline — q284's Holt gains a rotating 7-slot
  * seasonal vector, so the aggregate() accumulator becomes a LIST
  * ([l, b, s₀..s₆]) with list-wrapped elements on the DuckDB side
  * (list_reduce seeds from the first element, q333's trick). The level
  * update l' is inlined THREE times (Spark SQL lambdas cannot bind a
  * local), which is exact because integer truncation is deterministic —
  * the spec replays the full recurrence in driver BigInt. PrefixSpan
  * extends q164's contiguous trigrams to gap-tolerant ORDERED
  * subsequences (greedy earliest-occurrence chaining is existence-exact).
  * Clustering depth is the metric OPTIMIZE ZORDER moves (q317 chose a
  * layout; this measures what overlap the layout leaves). MASE is the
  * scale-free forecast metric that completes MAE/RMSE/MAPE/pinball.
  */
object SeasonQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G314: Holt–Winters additive (α=.2, β=.1, γ=.3) ────────────────
    // Daily revenue on the dense spine; state [l, b, s₀..s₆] in cents,
    // seasonal slot 0 always "today" (the vector rotates left each
    // step, so no day-index bookkeeping crosses the fold). Seed:
    // l₀ = y₀, b₀ = 0, s ≡ 0, fold over days 1.. Output: the 7-day-ahead
    // forecast ladder l + h·b + s_h with the final state alongside.
    "q369_holt_winters" -> ((s, dir) => {
      val raw = Tables.orders(s, dir)
        .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val dense = raw.agg(min("dn").as("lo"), max("dn").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("dn"))
        .join(raw, Seq("dn"), "left")
        .select(col("dn"), coalesce(col("y"), lit(0L)).as("y"))
      // l' = (2(y−s₀) + 8(l+b)) div 10; b' = ((l'−l) + 9b) div 10;
      // s₀' = (3(y−l') + 7s₀) div 10; acc' = [l', b', s₁..s₆, s₀']
      val lp = "((2 * (x[0] - acc[2]) + 8 * (acc[0] + acc[1])) div 10)"
      val folded = dense.agg(expr("array_sort(collect_list(struct(dn, y)))").as("sy"))
        .select(expr("transform(sy, e -> array(e.y))").as("ys"))
        .select(expr(
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |  array(ys[0][0], 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
             |  (acc, x) -> array(
             |    $lp,
             |    (($lp - acc[0]) + 9 * acc[1]) div 10,
             |    acc[3], acc[4], acc[5], acc[6], acc[7], acc[8],
             |    (3 * (x[0] - $lp) + 7 * acc[2]) div 10))""".stripMargin).as("st"))
      val ladder = s.range(1, 8).select(col("id").as("h"))
      folded.crossJoin(broadcast(ladder))
        .select(col("h"),
          expr("st[0]").as("level_c"), expr("st[1]").as("trend_c"),
          expr("element_at(st, cast((h - 1) % 7 + 3 as int))").as("season_c"))
        .withColumn("forecast_c", expr("level_c + h * trend_c + season_c"))
        .orderBy("h")
    }),

    // ── G315: PrefixSpan-lite ordered 3-subsequences ───────────────────
    // Frequent length-3 event-type subsequences with GAPS allowed
    // (q164's trigrams require adjacency): support = users for whom
    // a < b < c occurs in time order. Greedy earliest-occurrence
    // chaining decides existence exactly — first a, then first b after
    // it, then any c after that — and each hop is one aggregate on the
    // (user, type) grain, never a per-user scan. The 2-seq supports
    // ride along as the monotonicity certificate (q368's discipline).
    "q370_prefixspan" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), col("event_type").as("t"),
          unix_micros(col("ts")).as("us"))
      val fa = ev.groupBy("u", "t").agg(min("us").as("fa"))
      val ab = fa.as("a").join(ev.as("e"),
          col("a.u") === col("e.u") && col("e.us") > col("a.fa"))
        .groupBy(col("a.u").as("u"), col("a.t").as("ta"), col("e.t").as("tb"))
        .agg(min(col("e.us")).as("tab"))
      val s2 = ab.groupBy("ta", "tb").agg(countDistinct("u").as("sup2"))
      val abc = ab.as("p").join(ev.as("e"),
          col("p.u") === col("e.u") && col("e.us") > col("p.tab"))
        .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"), col("e.t").as("tc"))
        .agg(countDistinct(col("p.u")).as("sup3"))
      abc
        .join(s2.select(col("ta").as("x1"), col("tb").as("x2"), col("sup2").as("s_ab")),
          col("ta") === col("x1") && col("tb") === col("x2"))
        .join(s2.select(col("ta").as("y1"), col("tb").as("y2"), col("sup2").as("s_bc")),
          col("tb") === col("y1") && col("tc") === col("y2"))
        .select("ta", "tb", "tc", "sup3", "s_ab", "s_bc")
        .orderBy(col("sup3").desc, col("ta").asc, col("tb").asc, col("tc").asc)
        .limit(20)
    }),

    // ── G316: clustering-depth layout audit ────────────────────────────
    // The metric OPTIMIZE moves: simulate 16 files under (a) the
    // date-clustered layout and (b) an md5-shuffled layout (both via
    // distributedNtile — no global window), take each file's min/max of
    // the DATE day number, and measure how many files overlap each
    // file's span (pairwise interval test on the 16-row ledger — pure
    // metadata work). Clustered ≈ disjoint spans (depth ~1); shuffled ≈
    // every file spans everything (depth ~16). avg_depth_e4 is the
    // expected number of files a point-date predicate must read.
    "q371_clustering_depth" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .withColumn("h", md5(col("k").cast("string")))
      val n = o.agg(count(lit(1)).as("n_total"))
      def ledger(ordered: DataFrame, layout: String): DataFrame =
        ordered.groupBy("f")
          .agg(count(lit(1)).as("n_rows"), min("dn").as("lo"), max("dn").as("hi"))
          .withColumn("layout", lit(layout))
      val byDate = ledger(graft.ops.Relational.distributedNtile(
        o, Seq(col("dn"), col("k")), 16, n, "f"), "clustered")
      val byHash = ledger(graft.ops.Relational.distributedNtile(
        o, Seq(col("h"), col("k")), 16, n, "f"), "shuffled")
      val files = byDate.unionByName(byHash)
      files.as("a").join(files.as("b"),
          col("a.layout") === col("b.layout") &&
            col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
        .groupBy(col("a.layout").as("layout"))
        .agg(countDistinct(col("a.f")).as("n_files"),
          count(lit(1)).as("n_overlapping_pairs"),
          max(when(col("a.f") =!= col("b.f"), 1L).otherwise(0L)).as("any_cross_overlap"))
        .withColumn("avg_depth_e4", expr("n_overlapping_pairs * 10000 div n_files"))
        .orderBy("layout")
    }),

    // ── G317: MASE (mean absolute SCALED error) ────────────────────────
    // Per nation, weekly revenue in dense rank space (q359's lesson):
    // drift forecast over the last 4 ranks vs naive scale = in-sample
    // mean |Δy| over the training prefix. MASE_e4 < 10000 = the model
    // genuinely beats the naive one-step walk — the only scale-free way
    // to compare error across nations whose revenue differs 10×.
    "q372_mase" -> ((s, dir) => {
      val weekly0 = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01') div 7").as("w"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val weekly = weekly0.as("a")
        .join(weekly0.select(col("nat").as("n2"), col("w").as("w2")).as("b"),
          col("a.nat") === col("n2") && col("w2") <= col("a.w"))
        .groupBy(col("a.nat").as("nat"), col("a.w").as("w"), col("a.y").as("y"))
        .agg(count(lit(1)).as("rk"))
      val mx = weekly.groupBy("nat").agg(max("rk").as("rmax"))
      val base = weekly.join(broadcast(mx), Seq("nat"))
        .withColumn("phase", expr("case when rk > rmax - 4 then 'test' else 'fit' end"))
      // drift: last fit value + (rk - cut) * mean fit delta (exact ints)
      val lastFit = base.filter(col("phase") === "fit")
        .groupBy("nat").agg(max("rk").as("cut"))
      val anchor = base.join(broadcast(lastFit), Seq("nat"))
        .filter(col("rk") === col("cut"))
        .select(col("nat"), col("cut"), col("y").as("y_cut"))
      val deltas = base.as("a").join(base.as("b"),
          col("a.nat") === col("b.nat") && col("b.rk") === col("a.rk") - 1)
        .select(col("a.nat").as("nat"), col("a.rk").as("rk"), col("a.phase").as("phase"),
          expr("abs(a.y - b.y)").as("ad"), expr("a.y - b.y").as("d"))
      val fitStats = deltas.filter(col("phase") === "fit")
        .groupBy("nat").agg(expr("sum(ad) div count(1)").as("scale_c"),
          expr("sum(d) div count(1)").as("drift_c"))
      base.filter(col("phase") === "test")
        .join(broadcast(anchor), Seq("nat")).join(broadcast(fitStats), Seq("nat"))
        .withColumn("f", expr("y_cut + (rk - cut) * drift_c"))
        .groupBy(col("nat").cast(LongType).as("nat"))
        .agg(count(lit(1)).as("n_test"), max("scale_c").as("scale_c"),
          expr("sum(abs(y - f)) div count(1)").as("mae_c"))
        .withColumn("mase_e4", expr("mae_c * 10000 div greatest(scale_c, 1)"))
        .orderBy("nat")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q369_holt_winters" ->
      """WITH raw AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
        |              SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        |            FROM orders GROUP BY 1),
        |span AS (SELECT MIN(dn) AS lo, MAX(dn) AS hi FROM raw),
        |dense AS (SELECT t.dn, COALESCE(raw.y, 0) AS y
        |          FROM (SELECT UNNEST(generate_series(lo, hi)) AS dn FROM span) t
        |          LEFT JOIN raw ON t.dn = raw.dn),
        |arr AS (SELECT list([y] ORDER BY dn) AS ys FROM dense),
        |st AS (SELECT list_reduce(
        |    list_prepend([ys[1][1], 0, 0, 0, 0, 0, 0, 0, 0], ys[2:]),
        |    (acc, x) -> [
        |      (2 * (x[1] - acc[3]) + 8 * (acc[1] + acc[2])) // 10,
        |      (((2 * (x[1] - acc[3]) + 8 * (acc[1] + acc[2])) // 10 - acc[1]) + 9 * acc[2]) // 10,
        |      acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
        |      (3 * (x[1] - (2 * (x[1] - acc[3]) + 8 * (acc[1] + acc[2])) // 10) + 7 * acc[3]) // 10
        |    ]) AS st FROM arr),
        |ladder AS (SELECT UNNEST(range(1, 8)) AS h)
        |SELECT CAST(h AS BIGINT) AS h,
        |       CAST(st[1] AS BIGINT) AS level_c,
        |       CAST(st[2] AS BIGINT) AS trend_c,
        |       CAST(st[CAST((h - 1) % 7 + 3 AS INT)] AS BIGINT) AS season_c,
        |       CAST(st[1] + h * st[2] + st[CAST((h - 1) % 7 + 3 AS INT)] AS BIGINT) AS forecast_c
        |FROM st, ladder ORDER BY h""".stripMargin,

    "q370_prefixspan" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us FROM events),
        |fa AS (SELECT u, t, MIN(us) AS fa FROM ev GROUP BY u, t),
        |ab AS (SELECT fa.u, fa.t AS ta, e.t AS tb, MIN(e.us) AS tab
        |       FROM fa JOIN ev e ON fa.u = e.u AND e.us > fa.fa
        |       GROUP BY fa.u, fa.t, e.t),
        |s2 AS (SELECT ta, tb, COUNT(DISTINCT u) AS sup2 FROM ab GROUP BY ta, tb),
        |abc AS (SELECT p.ta, p.tb, e.t AS tc, COUNT(DISTINCT p.u) AS sup3
        |        FROM ab p JOIN ev e ON p.u = e.u AND e.us > p.tab
        |        GROUP BY p.ta, p.tb, e.t)
        |SELECT abc.ta, abc.tb, abc.tc, CAST(sup3 AS BIGINT) AS sup3,
        |       CAST(x.sup2 AS BIGINT) AS s_ab, CAST(y.sup2 AS BIGINT) AS s_bc
        |FROM abc
        |  JOIN s2 x ON abc.ta = x.ta AND abc.tb = x.tb
        |  JOIN s2 y ON abc.tb = y.ta AND abc.tc = y.tb
        |ORDER BY sup3 DESC, abc.ta, abc.tb, abc.tc LIMIT 20""".stripMargin,

    "q371_clustering_depth" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
        |             md5(CAST(o_orderkey AS VARCHAR)) AS h
        |           FROM orders),
        |bd AS (SELECT *, ntile(16) OVER (ORDER BY dn, k) AS f FROM o),
        |bh AS (SELECT *, ntile(16) OVER (ORDER BY h, k) AS f FROM o),
        |files AS (SELECT 'clustered' AS layout, f, COUNT(*) AS n_rows,
        |            MIN(dn) AS lo, MAX(dn) AS hi FROM bd GROUP BY f
        |          UNION ALL
        |          SELECT 'shuffled' AS layout, f, COUNT(*) AS n_rows,
        |            MIN(dn) AS lo, MAX(dn) AS hi FROM bh GROUP BY f)
        |SELECT a.layout,
        |       CAST(COUNT(DISTINCT a.f) AS BIGINT) AS n_files,
        |       CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
        |       CAST(MAX(CASE WHEN a.f != b.f THEN 1 ELSE 0 END) AS BIGINT) AS any_cross_overlap,
        |       CAST(COUNT(*) * 10000 // COUNT(DISTINCT a.f) AS BIGINT) AS avg_depth_e4
        |FROM files a JOIN files b
        |  ON a.layout = b.layout AND a.lo <= b.hi AND b.lo <= a.hi
        |GROUP BY a.layout ORDER BY a.layout""".stripMargin,

    "q372_mase" ->
      """WITH weekly0 AS (SELECT c_nationkey AS nat,
        |                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS w,
        |                   SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        |                 FROM orders JOIN customer ON o_custkey = c_custkey
        |                 GROUP BY 1, 2),
        |weekly AS (SELECT a.nat, a.w, a.y, CAST(COUNT(*) AS BIGINT) AS rk
        |           FROM weekly0 a JOIN weekly0 b ON a.nat = b.nat AND b.w <= a.w
        |           GROUP BY a.nat, a.w, a.y),
        |mx AS (SELECT nat, MAX(rk) AS rmax FROM weekly GROUP BY nat),
        |base AS (SELECT weekly.*, CASE WHEN rk > rmax - 4 THEN 'test' ELSE 'fit' END AS phase
        |         FROM weekly JOIN mx USING (nat)),
        |lastfit AS (SELECT nat, MAX(rk) AS cut FROM base WHERE phase = 'fit' GROUP BY nat),
        |anchor AS (SELECT base.nat, cut, y AS y_cut FROM base JOIN lastfit USING (nat)
        |           WHERE rk = cut),
        |deltas AS (SELECT a.nat, a.rk, a.phase, ABS(a.y - b.y) AS ad, a.y - b.y AS d
        |           FROM base a JOIN base b ON a.nat = b.nat AND b.rk = a.rk - 1),
        |fs AS (SELECT nat, SUM(ad) // COUNT(*) AS scale_c, SUM(d) // COUNT(*) AS drift_c
        |       FROM deltas WHERE phase = 'fit' GROUP BY nat)
        |SELECT CAST(base.nat AS BIGINT) AS nat,
        |       CAST(COUNT(*) AS BIGINT) AS n_test,
        |       CAST(MAX(scale_c) AS BIGINT) AS scale_c,
        |       CAST(SUM(ABS(y - (y_cut + (rk - cut) * drift_c))) // COUNT(*) AS BIGINT) AS mae_c,
        |       CAST(SUM(ABS(y - (y_cut + (rk - cut) * drift_c))) // COUNT(*) * 10000
        |         // GREATEST(MAX(scale_c), 1) AS BIGINT) AS mase_e4
        |FROM base JOIN anchor USING (nat) JOIN fs USING (nat)
        |WHERE phase = 'test'
        |GROUP BY base.nat ORDER BY nat""".stripMargin
  )
}
