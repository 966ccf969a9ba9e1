package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality and labeling operators (round 9, fifteenth wave):
  * l-diversity, seasonality-adjusted anomaly flags, Fellegi–Sunter
  * linkage weights, functional-dependency confidence, and
  * nearest-centroid classification.
  *
  * Reference intent: the reference serves raw per-store series with no
  * privacy, linkage or labeling layer (services/web-ui/app/
  * db_utils.py); a 100-TB corpus pipeline runs all five of these as
  * routine curation passes. Every score here is scaled-integer exact
  * (no division where a product comparison does the same job), so the
  * DuckDB oracle gates them bit-for-bit.
  */
object QualityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G176: l-diversity audit (privacy, beyond k-anonymity) ──────────
    // q140 counts group SIZES (k-anonymity); a group can be large yet
    // reveal everyone's sensitive value if that value is constant —
    // l-diversity counts DISTINCT sensitive values per quasi-identifier
    // group. QI = (priority, order-year), sensitive = order status.
    // One exact distinct aggregate (two-level: the (qi, status) grain
    // first, so the shuffle carries pre-combined rows), ledger per
    // group with the l<2 violation flag.
    "q231_l_diversity" -> ((s, dir) => {
      val g = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          col("o_orderstatus").as(("status")))
        .groupBy("prio", "yr", "status").agg(count(lit(1)).as("n"))
      g.groupBy("prio", "yr")
        .agg(sum("n").as("n_rows"), count(lit(1)).as("l_distinct"))
        .withColumn("violates_l2", col("l_distinct") < 2)
        .orderBy("prio", "yr")
    }),

    // ── G177: seasonality-adjusted outlier days (within-weekday 3σ) ────
    // q92's z-score flags Mondays as anomalies of a weekend-heavy
    // series; the fix is to deseasonalize FIRST. Division-free exact
    // form: within each weekday w (epoch-day mod 7 — engine-neutral),
    // a day is an outlier iff z² > 9 ⟺ (v·N_w − S_w)²·N_w >
    // 9·Σ_w(v·N_w − S_w)² — pure products, BIGINT deviations, one
    // DECIMAL(38) square. Two tiny aggregates over the ≤|days| daily
    // series (itself one corpus aggregate), then a broadcast-joined
    // flag projection. Emits flagged days only.
    "q232_seasonal_outliers" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("v_c"))
        .withColumn("wd", expr("datediff(day, date '1970-01-01') % 7").cast(LongType))
      val byWd = daily.groupBy("wd")
        .agg(count(lit(1)).as("n_w"), sum("v_c").as("s_w"))
      val dev = daily.join(broadcast(byWd), "wd")
        .withColumn("dev", expr("v_c * n_w - s_w")) // BIGINT: ~1e10 at sf0.1
        .withColumn("dev2", expr("cast(dev as decimal(38,0)) * dev"))
      val sums = dev.groupBy("wd").agg(sum("dev2").as("sum_dev2"))
      dev.join(broadcast(sums), "wd")
        .filter(expr("dev2 * n_w > 9 * sum_dev2"))
        .select(col("day"), col("wd"), col("v_c"), col("dev"))
        .orderBy("day")
    }),

    // ── G178: Fellegi–Sunter linkage weights (record-linkage m/u) ──────
    // The probabilistic record-linkage estimator: block candidate
    // pairs cheaply (same 20-char length bucket), label them with the
    // landed q23 MinHash truth, and per agreement pattern (lang
    // agrees?, source agrees?) estimate m = P(pattern|match),
    // u = P(pattern|non-match) and the match weight m/u — all e6
    // floor-scaled. The 2×2 pattern ledger IS the trained linker: at
    // scale you compute it once per corpus on blocked samples and
    // apply the weights in the match pass. Candidate generation is an
    // equi-join on the bucket key — never all-pairs.
    "q233_linkage_weights" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          expr("n_chars div 20").as("lb"))
      val cand = d.as("a").join(d.as("b"),
          col("a.lb") === col("b.lb") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.lang") === col("b.lang")).as("lang_eq"),
          (col("a.source") === col("b.source")).as("source_eq"))
      val truth = FeatureQueries.dupPairsTable(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(true).as("is_match"))
      val labeled = cand.join(truth, Seq("doc_a", "doc_b"), "left")
        .withColumn("is_match", coalesce(col("is_match"), lit(false)))
      val pat = labeled.groupBy("lang_eq", "source_eq")
        .agg(sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"),
          sum(when(col("is_match"), 0L).otherwise(1L)).as("n_nonmatch"))
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      pat
        .withColumn("mt", sum("n_match").over(w))
        .withColumn("ut", sum("n_nonmatch").over(w))
        .withColumn("m_e6", expr("n_match * 1000000 div mt"))
        .withColumn("u_e6", expr("n_nonmatch * 1000000 div ut"))
        .withColumn("weight_e6", expr("m_e6 * 1000000 div greatest(u_e6, 1)"))
        .select("lang_eq", "source_eq", "n_match", "n_nonmatch", "m_e6", "u_e6", "weight_e6")
        .orderBy("lang_eq", "source_eq")
    }),

    // ── G179: functional-dependency confidence (schema profiling) ──────
    // Does A determine B in the data? conf(A→B) = Σ_g max-per-group
    // RHS count / N — 1.0 iff the FD holds exactly, the discovery
    // statistic every profiler (and CBO) wants. Three candidate FDs
    // audited, each a two-level aggregate (the (A,B) grain first, so
    // the big shuffle carries pre-combined counts; the A grain is a
    // max over that). Union of three 1-row ledgers.
    "q234_fd_confidence" -> ((s, dir) => {
      def conf(df: DataFrame, name: String, lhs: String, rhs: String) = {
        df.groupBy(col(lhs).cast(StringType).as("l"), col(rhs).cast(StringType).as("r"))
          .agg(count(lit(1)).as("n"))
          .groupBy("l").agg(sum("n").as("gn"), max("n").as("gmax"))
          .agg(lit(name).as("fd"), sum("gn").as("n_rows"),
            count(lit(1)).as("n_groups"),
            expr("sum(gmax) * 10000 div sum(gn)").as("conf_e4"))
      }
      val o = Tables.orders(s, dir); val l = Tables.lineitem(s, dir)
      conf(o, "custkey->priority", "o_custkey", "o_orderpriority")
        .unionByName(conf(o, "priority->status", "o_orderpriority", "o_orderstatus"))
        .unionByName(conf(l, "orderkey->returnflag", "l_orderkey", "l_returnflag"))
        .orderBy("fd")
    }),

    // ── G180: nearest-centroid classification audit (confusion matrix) ─
    // The eval loop for any labeled embedding corpus: per-label mean
    // centroid (integer floor of sum/count per dim), assign every
    // vector to its nearest centroid by exact integer L2 on e6-scaled
    // components, and emit the confusion matrix. Centroid matrix is
    // labels×dims — broadcast; the assignment is one fused
    // join-aggregate per vector (same shape as q132's k-means step,
    // which this audits end-to-end: q132 moves centroids, this scores
    // them). min_by (d2, label) tiebreak keeps ties deterministic.
    "q235_centroid_classify" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          posexplode(graft.functions.VectorFunctions.asDouble(col("embedding")))
            .as(Seq("p", "e")))
        .select(col("vec_id"), col("label"), (col("p") + 1).cast(LongType).as("i"),
          round(col("e") * 1000000).cast(LongType).as("v6"))
      val cents = x.groupBy(col("label").as("clabel"), col("i"))
        .agg(expr("sum(v6) div count(1)").as("c6"))
      val assign = x.join(broadcast(cents), Seq("i"))
        .groupBy("vec_id", "label", "clabel")
        .agg(sum(expr("(v6 - c6) * (v6 - c6)")).as("d2"))
        .groupBy("vec_id", "label")
        .agg(min_by(col("clabel"), struct(col("d2"), col("clabel"))).as("pred"))
      assign.groupBy(col("label").as("true_label"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_label", "pred")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q231_l_diversity" ->
      """WITH g AS (SELECT o_orderpriority AS prio,
        |             CAST(year(o_orderdate) AS BIGINT) AS yr,
        |             o_orderstatus AS status, COUNT(*) AS n
        |           FROM orders GROUP BY 1, 2, 3)
        |SELECT prio, yr, CAST(SUM(n) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |       COUNT(*) < 2 AS violates_l2
        |FROM g GROUP BY prio, yr ORDER BY prio, yr""".stripMargin,

    "q232_seasonal_outliers" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |                 SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v_c
        |               FROM orders GROUP BY 1),
        |d2 AS (SELECT day, CAST((day - DATE '1970-01-01') AS BIGINT) % 7 AS wd,
        |         CAST(v_c AS BIGINT) AS v_c FROM daily),
        |wds AS (SELECT wd, COUNT(*) AS n_w, SUM(v_c) AS s_w FROM d2 GROUP BY wd),
        |dev AS (SELECT d2.day, d2.wd, d2.v_c,
        |          CAST(d2.v_c * wds.n_w - wds.s_w AS BIGINT) AS dev,
        |          wds.n_w
        |        FROM d2 JOIN wds USING (wd)),
        |sums AS (SELECT wd, SUM(CAST(dev AS HUGEINT) * dev) AS sum_dev2
        |         FROM dev GROUP BY wd)
        |SELECT dev.day, dev.wd, dev.v_c, dev.dev
        |FROM dev JOIN sums USING (wd)
        |WHERE CAST(dev.dev AS HUGEINT) * dev.dev * dev.n_w > 9 * sums.sum_dev2
        |ORDER BY dev.day""".stripMargin,

    "q233_linkage_weights" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars // 20 AS lb FROM documents),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |           a.lang = b.lang AS lang_eq, a.source = b.source AS source_eq
         |         FROM d a JOIN d b ON a.lb = b.lb AND a.doc_id < b.doc_id),
         |truth AS (SELECT doc_a, doc_b FROM ($q23)),
         |lab AS (SELECT c.lang_eq, c.source_eq,
         |          t.doc_a IS NOT NULL AS is_match
         |        FROM cand c LEFT JOIN truth t
         |          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
         |pat AS (SELECT lang_eq, source_eq,
         |          SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_match,
         |          SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS n_nonmatch
         |        FROM lab GROUP BY 1, 2),
         |tot AS (SELECT SUM(n_match) AS mt, SUM(n_nonmatch) AS ut FROM pat)
         |SELECT lang_eq, source_eq,
         |       CAST(n_match AS BIGINT) AS n_match,
         |       CAST(n_nonmatch AS BIGINT) AS n_nonmatch,
         |       CAST(n_match * 1000000 // tot.mt AS BIGINT) AS m_e6,
         |       CAST(n_nonmatch * 1000000 // tot.ut AS BIGINT) AS u_e6,
         |       CAST((n_match * 1000000 // tot.mt) * 1000000
         |            // GREATEST(n_nonmatch * 1000000 // tot.ut, 1) AS BIGINT) AS weight_e6
         |FROM pat, tot ORDER BY lang_eq, source_eq""".stripMargin
    },

    "q234_fd_confidence" ->
      """WITH c1 AS (SELECT CAST(o_custkey AS VARCHAR) AS l, o_orderpriority AS r,
        |              COUNT(*) AS n FROM orders GROUP BY 1, 2),
        |g1 AS (SELECT l, SUM(n) AS gn, MAX(n) AS gmax FROM c1 GROUP BY l),
        |f1 AS (SELECT 'custkey->priority' AS fd, CAST(SUM(gn) AS BIGINT) AS n_rows,
        |         CAST(COUNT(*) AS BIGINT) AS n_groups,
        |         CAST(SUM(gmax) * 10000 // SUM(gn) AS BIGINT) AS conf_e4 FROM g1),
        |c2 AS (SELECT o_orderpriority AS l, o_orderstatus AS r, COUNT(*) AS n
        |       FROM orders GROUP BY 1, 2),
        |g2 AS (SELECT l, SUM(n) AS gn, MAX(n) AS gmax FROM c2 GROUP BY l),
        |f2 AS (SELECT 'priority->status' AS fd, CAST(SUM(gn) AS BIGINT),
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(gmax) * 10000 // SUM(gn) AS BIGINT) FROM g2),
        |c3 AS (SELECT CAST(l_orderkey AS VARCHAR) AS l, l_returnflag AS r,
        |         COUNT(*) AS n FROM lineitem GROUP BY 1, 2),
        |g3 AS (SELECT l, SUM(n) AS gn, MAX(n) AS gmax FROM c3 GROUP BY l),
        |f3 AS (SELECT 'orderkey->returnflag' AS fd, CAST(SUM(gn) AS BIGINT),
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(gmax) * 10000 // SUM(gn) AS BIGINT) FROM g3)
        |SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
        |ORDER BY fd""".stripMargin,

    "q235_centroid_classify" ->
      """WITH x AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
        |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v6
        |           FROM embeddings),
        |c AS (SELECT label AS clabel, i, SUM(v6) // COUNT(*) AS c6
        |      FROM x GROUP BY 1, 2),
        |d AS (SELECT x.vec_id, x.label, c.clabel,
        |        SUM((x.v6 - c.c6) * (x.v6 - c.c6)) AS d2
        |      FROM x JOIN c USING (i) GROUP BY 1, 2, 3),
        |a AS (SELECT vec_id, label,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
        |          ORDER BY d2, clabel) AS BIGINT) AS rn, clabel
        |      FROM d)
        |SELECT label AS true_label, clabel AS pred, COUNT(*) AS n
        |FROM a WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
