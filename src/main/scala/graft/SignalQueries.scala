package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decision-signal operators (round 9, fourth wave): skyline / Pareto
  * frontier, an exact two-proportion experiment test, max drawdown,
  * bounded BFS layering of the dup graph, and a tolerance-bounded
  * nearest-event temporal join.
  *
  * Reference intent: the reference surfaces "which store/product is
  * doing well" as Streamlit charts over per-store forecasts
  * (web-ui/app/main.py); these are the decision-grade versions of such
  * questions — non-dominated frontiers instead of single-metric sorts,
  * significance instead of eyeballing two bars, worst-case drops
  * instead of averages — plus the graph/temporal joins that back them.
  * House disciplines throughout: scaled-BIGINT / DECIMAL(38,0)
  * arithmetic, sign-explicit division, candidate generation by
  * equi-join (never theta), windows over pre-aggregated rows.
  */
object SignalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G130: skyline / Pareto frontier (price × recency) ──────────────
    // The non-dominated set of orders under (o_totalprice ↑,
    // o_orderdate ↑) — "expensive AND recent", no weighting. Dominance
    // collapses to a staircase once prices are collapsed to their max
    // date: a point survives iff its date beats every strictly-higher
    // price's date. The scale move is the skyline identity
    // skyline(∪ partial skylines) = skyline — a partition-LOCAL
    // staircase pass (spark_partition_id window; result is
    // partitioning-invariant because the identity holds for ANY
    // partitioning) prunes all but each partition's frontier, and only
    // those survivors enter the single global sort. At 100 TB the
    // global window sees thousands of rows, not the fact table.
    "q185_skyline" -> ((s, dir) => {
      val pts = Tables.orders(s, dir)
        .groupBy(col("o_totalprice"))
        .agg(max(col("o_orderdate")).as("o_orderdate"))
      def staircase(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
        df.withColumn("cm", max("o_orderdate")
            .over(w.orderBy(col("o_totalprice").desc)
              .rowsBetween(Window.unboundedPreceding, -1)))
          .filter(col("cm").isNull || col("o_orderdate") > col("cm"))
          .drop("cm")
      val local = staircase(pts.withColumn("pid", spark_partition_id()),
        Window.partitionBy("pid")).drop("pid")
      staircase(local, Window.partitionBy())
        .orderBy(col("o_totalprice").desc)
    }),

    // ── G131: two-proportion z² test (experiment significance, exact) ──
    // The A/B readout: analysis units are ACTIVE (user, day) sessions
    // (per-user collapses to conv=1 for everyone on a corpus where all
    // users eventually purchase — the classic unit-choice mistake),
    // arms split by user-id parity (the deterministic stand-in for an
    // assignment service; all of a user's days land in one arm),
    // metric = session-converted-to-purchase, and the two-proportion
    // pooled z² — algebraically z² = (c₁n₂−c₂n₁)²·N / (n₁·n₂·C·(N−C))
    // — computed as ONE exact e6-scaled rational in DECIMAL(38,0)
    // (z² ≥ 3.84 ⇔ p < .05 at 1 d.f., the same reference line as
    // q138's χ²; a 2×2 χ² IS z²). One (user, day) conditional
    // aggregate, one 2-row rollup, arithmetic on a single row. At 10⁹
    // units only the c·n cross terms approach DECIMAL(38); the
    // documented move is computing in per-million units.
    "q186_ab_test_z2" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .withColumn("arm", (col("user_id") % 2).cast(IntegerType))
      val arms = u.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val wide = arms.agg(
        min(when(col("arm") === 0, col("n"))).as("n_a"),
        min(when(col("arm") === 0, col("c"))).as("conv_a"),
        min(when(col("arm") === 1, col("n"))).as("n_b"),
        min(when(col("arm") === 1, col("c"))).as("conv_b"))
      wide
        .withColumn("num", {
          val d = col("conv_a").cast(dec) * col("n_b").cast(dec) -
            col("conv_b").cast(dec) * col("n_a").cast(dec)
          d * d * (col("n_a") + col("n_b")).cast(dec) * lit(1000000L).cast(dec)
        })
        .withColumn("den",
          col("n_a").cast(dec) * col("n_b").cast(dec) *
            (col("conv_a") + col("conv_b")).cast(dec) *
            (col("n_a") + col("n_b") - col("conv_a") - col("conv_b")).cast(dec))
        // den = 0 ⇔ pooled rate is 0 or 1 ⇔ the arms cannot differ (num is
        // 0 too) — define z² = 0, the no-evidence reading, in both engines
        .withColumn("z2_e6", expr(
          "cast(case when den = 0 then 0 else num div den end as bigint)"))
        .select("n_a", "conv_a", "n_b", "conv_b", "z2_e6")
    }),

    // ── G132: max drawdown (worst peak-to-trough drop per series) ──────
    // The risk statistic an average hides: per event type, the largest
    // drop of the daily-value series below its running peak, and the
    // EARLIEST day it bottomed. One (type, day) map-side cell
    // aggregate; the running peak is a sort window over ≤|days| rows
    // per type; the argmin day comes from a self-join of the tiny
    // drawdown table against its per-type max (exact, tie → earliest
    // day) — every corpus-scale byte is gone after the first
    // aggregate.
    "q187_max_drawdown" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("v6"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val dd = daily
        .withColumn("peak", max("v6").over(w))
        .withColumn("dd", col("peak") - col("v6"))
      val worst = dd.groupBy("event_type")
        .agg(max("v6").as("peak_day_v6"), max("dd").as("max_drawdown_v6"))
      worst.join(dd.select(col("event_type"), col("day"), col("dd")), Seq("event_type"))
        .filter(col("dd") === col("max_drawdown_v6"))
        .groupBy("event_type")
        .agg(min("peak_day_v6").as("peak_day_v6"),
          min("max_drawdown_v6").as("max_drawdown_v6"),
          min("day").as("trough_day"))
        .orderBy("event_type")
    }),

    // ── G133: bounded BFS layering (3-hop reachability census) ─────────
    // Shortest-path structure the CC labels (q64) and core numbers
    // (q183) don't see: exact BFS layers 0..3 from the dup graph's
    // lowest-id node. Three unrolled frontier expansions (q150/q183
    // discipline — fixed rounds, deterministic), each ONE equi-join of
    // the frontier against the edge list + an anti-join against the
    // visited set; the visited/frontier tables are node ids only.
    // Layer counts are the census; at 100 TB this is the probe that
    // sizes how much of a dup cluster one hop of transitivity pulls
    // in. Rides the landed q23 pair snapshot.
    "q188_bfs_layers" -> ((s, dir) => {
      val edges0 = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      // undirected: both orientations once
      val edges = edges0.unionByName(
        edges0.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val seed = edges0.agg(min("doc_a").as("id"))
      def expand(frontier: DataFrame, visited: DataFrame): DataFrame =
        edges.join(frontier.withColumnRenamed("id", "doc_a"), Seq("doc_a"), "left_semi")
          .select(col("doc_b").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
      val l0 = seed
      val v0 = l0
      val l1 = expand(l0, v0)
      val v1 = v0.unionByName(l1)
      val l2 = expand(l1, v1)
      val v2 = v1.unionByName(l2)
      val l3 = expand(l2, v2)
      def census(l: DataFrame, d: Int) =
        l.agg(count(lit(1)).as("n_nodes")).withColumn("dist", lit(d.toLong))
      census(l0, 0).unionByName(census(l1, 1))
        .unionByName(census(l2, 2)).unionByName(census(l3, 3))
        .select("dist", "n_nodes")
        .orderBy("dist")
    }),

    // ── G134: nearest-event temporal join (tolerance ±10 min) ──────────
    // q40's as-of join looks strictly backward; attribution often wants
    // the NEAREST event either side within a tolerance — pandas
    // merge_asof(direction='nearest') at corpus scale. No theta join:
    // both sides bucket to ⌊us/tol⌋ and purchases probe clicks in
    // buckets {b−1, b, b+1} (the q151 adjacent-bucket trick — any
    // event within ±tol is in one of the three), then an exact
    // min_by((|Δ|, Δ-sign-preference, click_id)) picks the winner —
    // ties on distance resolve to the EARLIER click, then lowest id.
    // One (user, bucket) equi-join; fan-out is events-per-10-min, not
    // events-per-user.
    "q189_nearest_event_join" -> ((s, dir) => {
      val TolUs = 600000000L // 10 minutes
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("us").as("p_us"))
        .withColumn("b", expr(s"p_us div $TolUs"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("us").as("c_us"))
        .withColumn("b", explode(expr(
          s"array(c_us div $TolUs - 1, c_us div $TolUs, c_us div $TolUs + 1)")))
      purchases.join(clicks, Seq("user_id", "b"))
        .withColumn("delta", abs(col("c_us") - col("p_us")))
        .filter(col("delta") <= TolUs)
        .groupBy("p_id")
        .agg(min_by(struct(col("c_id"), col("c_us"), col("delta")),
          struct(col("delta"), col("c_us"), col("c_id"))).as("m"))
        .select(col("p_id"), col("m.c_id").as("c_id"),
          col("m.delta").as("delta_us"))
        .orderBy("p_id")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q185_skyline" ->
      """WITH c AS (SELECT o_totalprice, MAX(o_orderdate) AS o_orderdate
        |           FROM orders GROUP BY 1),
        |w AS (SELECT o_totalprice, o_orderdate,
        |        MAX(o_orderdate) OVER (ORDER BY o_totalprice DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
        |      FROM c)
        |SELECT o_totalprice, o_orderdate
        |FROM w WHERE cm IS NULL OR o_orderdate > cm
        |ORDER BY o_totalprice DESC""".stripMargin,

    "q186_ab_test_z2" ->
      """WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |           FROM events GROUP BY 1, 2),
        |a AS (SELECT user_id % 2 AS arm, COUNT(*) AS n, SUM(conv) AS c
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |        MIN(CASE WHEN arm = 0 THEN n END) AS n_a,
        |        MIN(CASE WHEN arm = 0 THEN c END) AS conv_a,
        |        MIN(CASE WHEN arm = 1 THEN n END) AS n_b,
        |        MIN(CASE WHEN arm = 1 THEN c END) AS conv_b
        |      FROM a)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
        |       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
        |       CAST(CASE WHEN CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
        |                      * (n_a + n_b - conv_a - conv_b) = 0 THEN 0
        |         ELSE
        |         ((CAST(conv_a AS HUGEINT) * n_b - CAST(conv_b AS HUGEINT) * n_a)
        |          * (CAST(conv_a AS HUGEINT) * n_b - CAST(conv_b AS HUGEINT) * n_a)
        |          * (n_a + n_b) * 1000000)
        |         // (CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
        |            * (n_a + n_b - conv_a - conv_b))
        |         END AS BIGINT) AS z2_e6
        |FROM w""".stripMargin,

    "q187_max_drawdown" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v6
        |               FROM events GROUP BY 1, 2),
        |dd AS (SELECT event_type, day, v6,
        |         MAX(v6) OVER (PARTITION BY event_type ORDER BY day
        |                       ROWS UNBOUNDED PRECEDING) - v6 AS dd
        |       FROM daily),
        |worst AS (SELECT event_type, MAX(v6) AS peak_day_v6,
        |            CAST(MAX(dd) AS BIGINT) AS max_drawdown_v6
        |          FROM dd GROUP BY 1)
        |SELECT w.event_type, MIN(w.peak_day_v6) AS peak_day_v6,
        |       MIN(w.max_drawdown_v6) AS max_drawdown_v6,
        |       MIN(d.day) AS trough_day
        |FROM worst w JOIN dd d
        |  ON d.event_type = w.event_type AND d.dd = w.max_drawdown_v6
        |GROUP BY w.event_type ORDER BY w.event_type""".stripMargin,

    "q188_bfs_layers" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p AS MATERIALIZED (SELECT doc_a, doc_b FROM ($q23)),
         |e AS MATERIALIZED (SELECT doc_a, doc_b FROM p
         |      UNION ALL SELECT doc_b, doc_a FROM p),
         |l0 AS MATERIALIZED (SELECT MIN(doc_a) AS id FROM p),
         |l1 AS MATERIALIZED (SELECT DISTINCT doc_b AS id FROM e
         |       WHERE doc_a IN (SELECT id FROM l0)
         |         AND doc_b NOT IN (SELECT id FROM l0)),
         |l2 AS MATERIALIZED (SELECT DISTINCT doc_b AS id FROM e
         |       WHERE doc_a IN (SELECT id FROM l1)
         |         AND doc_b NOT IN (SELECT id FROM l0)
         |         AND doc_b NOT IN (SELECT id FROM l1)),
         |l3 AS MATERIALIZED (SELECT DISTINCT doc_b AS id FROM e
         |       WHERE doc_a IN (SELECT id FROM l2)
         |         AND doc_b NOT IN (SELECT id FROM l0)
         |         AND doc_b NOT IN (SELECT id FROM l1)
         |         AND doc_b NOT IN (SELECT id FROM l2))
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS dist, (SELECT COUNT(*) FROM l0) AS n_nodes
         |  UNION ALL SELECT 1, (SELECT COUNT(*) FROM l1)
         |  UNION ALL SELECT 2, (SELECT COUNT(*) FROM l2)
         |  UNION ALL SELECT 3, (SELECT COUNT(*) FROM l3))
         |ORDER BY dist""".stripMargin
    },

    "q189_nearest_event_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, us AS c_us FROM e
        |      WHERE event_type = 'click'),
        |j AS (SELECT p_id, c_id, c_us, ABS(c_us - p_us) AS delta
        |      FROM p JOIN c USING (user_id)
        |      WHERE ABS(c_us - p_us) <= 600000000),
        |r AS (SELECT p_id, c_id, delta,
        |        ROW_NUMBER() OVER (PARTITION BY p_id
        |          ORDER BY delta, c_us, c_id) AS rn
        |      FROM j)
        |SELECT p_id, c_id, delta AS delta_us
        |FROM r WHERE rn = 1 ORDER BY p_id""".stripMargin
  )
}
