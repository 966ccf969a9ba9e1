package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inference-quality wave (round 10, sixty-third wave): modularity of
  * the dup-graph clustering, Wilson-score ranking, Benjamini–Hochberg
  * FDR control, and Gini split scoring.
  *
  * Reference intent: the reference surfaces raw per-store rates and
  * rankings (services/web-ui) with no uncertainty control at all.
  * q425 grades q64's connected components with Newman modularity —
  * cross-multiplied to Q·4m² so no probability materializes — against
  * a same-node random partition (the null the clustering must beat).
  * q426 is "how not to sort by average": the Wilson lower bound
  * (z=1.96) re-ranks nation urgency rates, small samples sink, and
  * every rank inversion vs the naive rate is disclosed. q427 runs
  * Benjamini–Hochberg step-up over 25 per-nation two-proportion
  * tests, p-values from a shared design-time χ²₁ ladder (conservative
  * upper bounds — BH stays valid); naive α=0.05 rejections counted
  * beside it. q428 scores candidate split features by exact Gini
  * gain — the CART split-finder's inner loop as one unpivoted
  * aggregate.
  */
object InferenceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G370: modularity certificate for the dup clustering ────────────
    // Edges: the memoized MinHash dup pairs (q23's fixture). Every
    // pair is intra-component by CC construction, so Q_cc = 1 −
    // ΣK_c²/4m² — the degree-null term still bites. Null arm: the
    // same nodes hashed into 32 random parts. Q·4m² stays integer:
    // Q_num = Σ_c (4m·e_c − K_c²). Certificate: Q_cc > Q_rand.
    "q425_modularity" -> ((s, dir) => {
      val pairs = FeatureQueries.dupPairsTable(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val comp = FeatureQueries.componentsTable(s, dir)
        .select(col("doc_id").as("id"), col("comp"))
        .withColumn("rnd", expr("pmod(md5_60(cast(id as string)), 32)"))
      val m = pairs.agg(count(lit(1)).as("m"))
      val deg = pairs.select(col("a").as("id"))
        .unionAll(pairs.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("k"))
      val nodes = comp.join(deg, Seq("id"), "left")
        .select(col("id"), col("comp"), col("rnd"),
          coalesce(col("k"), lit(0L)).as("k"))
      val epairs = pairs
        .join(nodes.select(col("id").as("a"), col("comp").as("ca"),
          col("rnd").as("ra")), "a")
        .join(nodes.select(col("id").as("b"), col("comp").as("cb"),
          col("rnd").as("rb")), "b")
      def qNum(lbl: String, ec: DataFrame, kc: DataFrame): DataFrame =
        kc.join(ec, Seq("c"), "left")
          .select(col("c"), col("kc"), coalesce(col("ec"), lit(0L)).as("ec"))
          .crossJoin(broadcast(m))
          .agg(sum(expr("4 * m * ec - kc * kc")).as(s"qnum_$lbl"),
            count(lit(1)).as(s"n_${lbl}_parts"))
      val ccQ = qNum("cc",
        epairs.filter(col("ca") === col("cb"))
          .groupBy(col("ca").as("c")).agg(count(lit(1)).as("ec")),
        nodes.groupBy(col("comp").as("c")).agg(sum("k").as("kc")))
      val rndQ = qNum("rand",
        epairs.filter(col("ra") === col("rb"))
          .groupBy(col("ra").as("c")).agg(count(lit(1)).as("ec")),
        nodes.groupBy(col("rnd").as("c")).agg(sum("k").as("kc")))
      nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(broadcast(m))
        .crossJoin(broadcast(ccQ)).crossJoin(broadcast(rndQ))
        .withColumn("q_cc_e6", expr("qnum_cc * 1000000 div (4 * m * m)"))
        .withColumn("q_rand_e6", expr("qnum_rand * 1000000 div (4 * m * m)"))
        .withColumn("cc_beats_random", expr(
          "case when q_cc_e6 > q_rand_e6 then 1L else 0L end"))
        .select("n_nodes", "m", "n_cc_parts", "n_rand_parts",
          "q_cc_e6", "q_rand_e6", "cc_beats_random")
    }),

    // ── G371: Wilson lower-bound ranking ───────────────────────────────
    // Per nation: urgent-order share. Wilson LB at z=1.96 in one
    // floor-sqrt (q401's one-op discipline): LB_e4 = (s·10⁶ +
    // z²_e4·10²/2 − z_e2·⌊√(s(n−s)·10⁸/n + z²_e4·10⁴/4)⌋)·10² div
    // (n·10⁴ + z²_e4). Ranks on the 25-row grain from strict-greater
    // pair counts (q396 — no window); inversions vs the naive rate
    // disclosed per nation.
    "q426_wilson_ranking" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("y"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val per = o.join(c, "o_custkey").groupBy("g")
        .agg(count(lit(1)).as("n"), sum("y").as("s"))
        .withColumn("p_e4", expr("s * 10000 div n"))
        .withColumn("x_e8", expr(
          "s * (n - s) * 100000000 div n + 38416 * 10000 div 4"))
        .withColumn("lb_e4", expr(
          """(s * 1000000 + 38416 * 100 div 2
            |  - 196 * cast(floor(sqrt(cast(x_e8 as double))) as bigint))
            |  * 100 div (n * 10000 + 38416)""".stripMargin))
      val r = per.select(col("g").as("g2"), col("p_e4").as("p2"),
        col("lb_e4").as("lb2"))
      per.crossJoin(broadcast(r))
        .groupBy("g")
        .agg(max("n").as("n"), max("s").as("s"),
          max("p_e4").as("p_e4"), max("lb_e4").as("lb_e4"),
          sum(expr("case when p2 > p_e4 or (p2 = p_e4 and g2 < g) " +
            "then 1L else 0L end")).as("rank0_p"),
          sum(expr("case when lb2 > lb_e4 or (lb2 = lb_e4 and g2 < g) " +
            "then 1L else 0L end")).as("rank0_lb"))
        .select(col("g"), col("n"), col("s"), col("p_e4"), col("lb_e4"),
          expr("rank0_p + 1").as("rank_p"),
          expr("rank0_lb + 1").as("rank_lb"),
          expr("case when rank0_p != rank0_lb then 1L else 0L end")
            .as("inverted"))
        .orderBy("g")
    }),

    // ── G372: Benjamini–Hochberg FDR control ───────────────────────────
    // 25 tests: each nation's urgent rate vs the rest of the corpus,
    // z² exactly cross-multiplied (q186's form). p-values from the
    // shared χ²₁ design ladder (conservative upper bounds — step-up
    // stays valid under them). Max-rank ties, k* = max rank whose
    // p ≤ rank·α/m, reject every rank ≤ k*. The naive α=0.05 column
    // sits beside it — the multiplicity cost made visible.
    "q427_bh_fdr" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("y"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val per = o.join(c, "o_custkey").groupBy("g")
        .agg(count(lit(1)).as("n_a"), sum("y").as("c_a"))
      val tot = per.agg(sum("n_a").as("nt"), sum("c_a").as("ct"),
        count(lit(1)).as("m_tests"))
      val ladder =
        """case when z2_e6 >= 10827566 then 1000L
          |     when z2_e6 >= 7879439 then 5000L
          |     when z2_e6 >= 6634897 then 10000L
          |     when z2_e6 >= 5023886 then 25000L
          |     when z2_e6 >= 3841459 then 50000L
          |     when z2_e6 >= 2705543 then 100000L
          |     when z2_e6 >= 1642374 then 200000L
          |     when z2_e6 >= 454936 then 500000L
          |     else 1000000L end""".stripMargin
      val tests = per.crossJoin(broadcast(tot))
        .withColumn("n_b", expr("nt - n_a"))
        .withColumn("c_b", expr("ct - c_a"))
        .withColumn("z2_e6", expr(
          """cast(case when ct = 0 or ct = nt then 0 else
            |  cast(c_a * n_b - c_b * n_a as decimal(38, 0))
            |  * (c_a * n_b - c_b * n_a) * nt * 1000000
            |  div (cast(n_a as decimal(38, 0)) * n_b * ct * (nt - ct))
            |end as bigint)""".stripMargin))
        .withColumn("p_e6", expr(ladder))
      val r = tests.select(col("g").as("g2"), col("p_e6").as("p2"))
      val ranked = tests.crossJoin(broadcast(r))
        .groupBy("g")
        .agg(max("n_a").as("n_a"), max("c_a").as("c_a"),
          max("z2_e6").as("z2_e6"), max("p_e6").as("p_e6"),
          max("m_tests").as("m_tests"),
          sum(expr("case when p2 <= p_e6 then 1L else 0L end")).as("rnk"))
        .withColumn("step_ok", expr(
          "case when p_e6 * m_tests <= rnk * 50000 then 1L else 0L end"))
      val kmax = ranked.agg(coalesce(
        max(when(col("step_ok") === 1L, col("rnk"))), lit(0L)).as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("g"), col("n_a"), col("c_a"), col("z2_e6"), col("p_e6"),
          col("rnk"),
          expr("case when rnk <= kmax then 1L else 0L end").as("bh_reject"),
          expr("case when p_e6 <= 50000 then 1L else 0L end")
            .as("naive_reject"))
        .orderBy("g")
    }),

    // ── G373: Gini split scoring (the CART inner loop) ─────────────────
    // Label: urgent order. Candidates: customer nation, order month,
    // weekday (days-since-known-Monday mod 7 — NEVER an engine weekday
    // builtin, q343), and price magnitude (digit count). Gini(S)·n² =
    // 2s(n−s); gain at e6 with the per-value division mirrored:
    // gain = 2s(n−s)·10⁶ div n² − Σ_v 2s_v(n_v−s_v)·10⁶ div (n·n_v).
    // One unpivoted aggregate scores all four features in one pass.
    "q428_gini_split" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("y"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val base = o.join(c, "o_custkey")
        .select(col("y"), explode(expr(
          """array(
            |  named_struct('f', 'nation', 'v', cast(g as string)),
            |  named_struct('f', 'month', 'v', cast(month(d) as string)),
            |  named_struct('f', 'weekday', 'v',
            |    cast(pmod(datediff(d, to_date('1970-01-05')), 7) as string)),
            |  named_struct('f', 'pricelen', 'v',
            |    cast(length(cast(cents as string)) as string)))"""
            .stripMargin)).as("z"))
        .select(col("y"), expr("z.f").as("f"), expr("z.v").as("v"))
      val perV = base.groupBy("f", "v")
        .agg(count(lit(1)).as("n_v"), sum("y").as("s_v"))
      val parent = perV.groupBy("f")
        .agg(sum("n_v").as("n"), sum("s_v").as("s"),
          count(lit(1)).as("n_values"))
      perV.join(broadcast(parent), "f")
        .groupBy("f")
        .agg(max("n_values").as("n_values"), max("n").as("n"), max("s").as("s"),
          sum(expr("2 * s_v * (n_v - s_v) * 1000000 div (n * n_v)"))
            .as("gini_children_e6"))
        .withColumn("gini_parent_e6", expr("2 * s * (n - s) * 1000000 div (n * n)"))
        .withColumn("gain_e6", expr("gini_parent_e6 - gini_children_e6"))
        .select("f", "n_values", "n", "s", "gini_parent_e6",
          "gini_children_e6", "gain_e6")
        .orderBy(col("gain_e6").desc, col("f").asc)
    })
  )

  def oracleSql: Map[String, String] = {
    val ladderSql =
      """CASE WHEN z2_e6 >= 10827566 THEN 1000
        |     WHEN z2_e6 >= 7879439 THEN 5000
        |     WHEN z2_e6 >= 6634897 THEN 10000
        |     WHEN z2_e6 >= 5023886 THEN 25000
        |     WHEN z2_e6 >= 3841459 THEN 50000
        |     WHEN z2_e6 >= 2705543 THEN 100000
        |     WHEN z2_e6 >= 1642374 THEN 200000
        |     WHEN z2_e6 >= 454936 THEN 500000
        |     ELSE 1000000 END""".stripMargin
    Map(

    "q425_modularity" ->
      s"""${FeatureQueries.ccCte},
        |comp AS (SELECT id, lbl AS comp,
        |    CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 32 AS rnd
        |  FROM l${FeatureQueries.CcRounds}),
        |mm AS (SELECT COUNT(*) AS m FROM pairs),
        |deg AS (SELECT id, COUNT(*) AS k FROM
        |    (SELECT doc_a AS id FROM pairs
        |     UNION ALL SELECT doc_b AS id FROM pairs) z GROUP BY id),
        |nodes AS (SELECT c.id, c.comp, c.rnd, COALESCE(d.k, 0) AS k
        |          FROM comp c LEFT JOIN deg d ON c.id = d.id),
        |ep AS (SELECT p.doc_a, p.doc_b, na.comp AS ca, nb.comp AS cb,
        |    na.rnd AS ra, nb.rnd AS rb
        |  FROM pairs p JOIN nodes na ON p.doc_a = na.id
        |    JOIN nodes nb ON p.doc_b = nb.id),
        |ecc AS (SELECT ca AS c, COUNT(*) AS ec FROM ep WHERE ca = cb
        |        GROUP BY ca),
        |kcc AS (SELECT comp AS c, SUM(k) AS kc FROM nodes GROUP BY comp),
        |qcc AS (SELECT SUM(4 * mm.m * COALESCE(ecc.ec, 0) - kcc.kc * kcc.kc)
        |    AS qnum_cc, COUNT(*) AS n_cc_parts
        |  FROM kcc LEFT JOIN ecc ON kcc.c = ecc.c, mm),
        |ern AS (SELECT ra AS c, COUNT(*) AS ec FROM ep WHERE ra = rb
        |        GROUP BY ra),
        |krn AS (SELECT rnd AS c, SUM(k) AS kc FROM nodes GROUP BY rnd),
        |qrn AS (SELECT SUM(4 * mm.m * COALESCE(ern.ec, 0) - krn.kc * krn.kc)
        |    AS qnum_rand, COUNT(*) AS n_rand_parts
        |  FROM krn LEFT JOIN ern ON krn.c = ern.c, mm)
        |SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
        |  CAST(mm.m AS BIGINT) AS m,
        |  CAST(qcc.n_cc_parts AS BIGINT) AS n_cc_parts,
        |  CAST(qrn.n_rand_parts AS BIGINT) AS n_rand_parts,
        |  CAST(qcc.qnum_cc * 1000000 // (4 * mm.m * mm.m) AS BIGINT)
        |    AS q_cc_e6,
        |  CAST(qrn.qnum_rand * 1000000 // (4 * mm.m * mm.m) AS BIGINT)
        |    AS q_rand_e6,
        |  CAST(CASE WHEN qcc.qnum_cc * 1000000 // (4 * mm.m * mm.m)
        |    > qrn.qnum_rand * 1000000 // (4 * mm.m * mm.m)
        |    THEN 1 ELSE 0 END AS BIGINT) AS cc_beats_random
        |FROM mm, qcc, qrn""".stripMargin,

    "q426_wilson_ranking" ->
      """WITH o AS (SELECT o_custkey,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS y FROM orders),
        |per AS (SELECT c.c_nationkey AS g, COUNT(*) AS n, SUM(y) AS s
        |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey),
        |w AS (SELECT g, n, s, s * 10000 // n AS p_e4,
        |    (s * 1000000 + 38416 * 100 // 2
        |      - 196 * CAST(FLOOR(SQRT(CAST(
        |          s * (n - s) * 100000000 // n + 38416 * 10000 // 4
        |        AS DOUBLE))) AS BIGINT))
        |      * 100 // (n * 10000 + 38416) AS lb_e4
        |  FROM per)
        |SELECT a.g, CAST(a.n AS BIGINT) AS n, CAST(a.s AS BIGINT) AS s,
        |  CAST(a.p_e4 AS BIGINT) AS p_e4, CAST(a.lb_e4 AS BIGINT) AS lb_e4,
        |  CAST(SUM(CASE WHEN b.p_e4 > a.p_e4
        |    OR (b.p_e4 = a.p_e4 AND b.g < a.g) THEN 1 ELSE 0 END) + 1
        |    AS BIGINT) AS rank_p,
        |  CAST(SUM(CASE WHEN b.lb_e4 > a.lb_e4
        |    OR (b.lb_e4 = a.lb_e4 AND b.g < a.g) THEN 1 ELSE 0 END) + 1
        |    AS BIGINT) AS rank_lb,
        |  CAST(CASE WHEN SUM(CASE WHEN b.p_e4 > a.p_e4
        |      OR (b.p_e4 = a.p_e4 AND b.g < a.g) THEN 1 ELSE 0 END)
        |    != SUM(CASE WHEN b.lb_e4 > a.lb_e4
        |      OR (b.lb_e4 = a.lb_e4 AND b.g < a.g) THEN 1 ELSE 0 END)
        |    THEN 1 ELSE 0 END AS BIGINT) AS inverted
        |FROM w a, w b GROUP BY a.g, a.n, a.s, a.p_e4, a.lb_e4
        |ORDER BY a.g""".stripMargin,

    "q427_bh_fdr" ->
      s"""WITH o AS (SELECT o_custkey,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS y FROM orders),
        |per AS (SELECT c.c_nationkey AS g, COUNT(*) AS n_a, SUM(y) AS c_a
        |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey),
        |tot AS (SELECT SUM(n_a) AS nt, SUM(c_a) AS ct,
        |    COUNT(*) AS m_tests FROM per),
        |tests AS (SELECT g, n_a, c_a,
        |    CAST(CASE WHEN ct = 0 OR ct = nt THEN 0 ELSE
        |      CAST(c_a * (nt - n_a) - (ct - c_a) * n_a AS HUGEINT)
        |      * (c_a * (nt - n_a) - (ct - c_a) * n_a) * nt * 1000000
        |      // (CAST(n_a AS HUGEINT) * (nt - n_a) * ct * (nt - ct))
        |    END AS BIGINT) AS z2_e6, m_tests
        |  FROM per, tot),
        |lp AS (SELECT *, $ladderSql AS p_e6 FROM tests),
        |rk AS (SELECT a.g, a.n_a, a.c_a, a.z2_e6, a.p_e6, a.m_tests,
        |    COUNT(*) FILTER (WHERE b.p_e6 <= a.p_e6) AS rnk
        |  FROM lp a, lp b
        |  GROUP BY a.g, a.n_a, a.c_a, a.z2_e6, a.p_e6, a.m_tests),
        |km AS (SELECT COALESCE(MAX(CASE WHEN p_e6 * m_tests <= rnk * 50000
        |    THEN rnk END), 0) AS kmax FROM rk)
        |SELECT rk.g, CAST(rk.n_a AS BIGINT) AS n_a,
        |  CAST(rk.c_a AS BIGINT) AS c_a, rk.z2_e6,
        |  CAST(rk.p_e6 AS BIGINT) AS p_e6, CAST(rk.rnk AS BIGINT) AS rnk,
        |  CAST(CASE WHEN rk.rnk <= km.kmax THEN 1 ELSE 0 END AS BIGINT)
        |    AS bh_reject,
        |  CAST(CASE WHEN rk.p_e6 <= 50000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS naive_reject
        |FROM rk, km ORDER BY rk.g""".stripMargin,

    "q428_gini_split" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS y FROM orders),
        |j AS (SELECT o.y, o.d, o.cents, c.c_nationkey AS g
        |  FROM o JOIN customer c ON o.o_custkey = c.c_custkey),
        |base AS (
        |  SELECT y, 'nation' AS f, CAST(g AS VARCHAR) AS v FROM j
        |  UNION ALL
        |  SELECT y, 'month', CAST(month(d) AS VARCHAR) FROM j
        |  UNION ALL
        |  SELECT y, 'weekday', CAST(date_diff('day', DATE '1970-01-05', d)
        |    % 7 AS VARCHAR) FROM j
        |  UNION ALL
        |  SELECT y, 'pricelen', CAST(length(CAST(cents AS VARCHAR))
        |    AS VARCHAR) FROM j),
        |pv AS (SELECT f, v, COUNT(*) AS n_v, SUM(y) AS s_v
        |       FROM base GROUP BY f, v),
        |par AS (SELECT f, SUM(n_v) AS n, SUM(s_v) AS s,
        |        COUNT(*) AS n_values FROM pv GROUP BY f)
        |SELECT pv.f, CAST(MAX(par.n_values) AS BIGINT) AS n_values,
        |  CAST(MAX(par.n) AS BIGINT) AS n, CAST(MAX(par.s) AS BIGINT) AS s,
        |  CAST(2 * MAX(par.s) * (MAX(par.n) - MAX(par.s)) * 1000000
        |    // (MAX(par.n) * MAX(par.n)) AS BIGINT) AS gini_parent_e6,
        |  CAST(SUM(2 * pv.s_v * (pv.n_v - pv.s_v) * 1000000
        |    // (par.n * pv.n_v)) AS BIGINT) AS gini_children_e6,
        |  CAST(2 * MAX(par.s) * (MAX(par.n) - MAX(par.s)) * 1000000
        |    // (MAX(par.n) * MAX(par.n))
        |    - SUM(2 * pv.s_v * (pv.n_v - pv.s_v) * 1000000
        |      // (par.n * pv.n_v)) AS BIGINT) AS gain_e6
        |FROM pv JOIN par ON pv.f = par.f
        |GROUP BY pv.f
        |ORDER BY gain_e6 DESC, pv.f""".stripMargin
    )
  }
}
