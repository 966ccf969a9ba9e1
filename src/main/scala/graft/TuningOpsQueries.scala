package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Tuning/attribution wave (round 12, sixth wave): calibrate a model
  * knob against held-out likelihood, and attribute an aggregate drift
  * score back to the cells that moved.
  *
  * Reference intent — every query names its consumer:
  *  - q567: Jelinek–Mercer interpolation bake-off (Jelinek & Mercer
  *    1980; Zhai & Lafferty SIGIR 2001 find λ ≈ 0.7 for long queries):
  *    held-out bigram NLL at λ ∈ {0.1, 0.3, 0.5, 0.7, 0.9} for
  *    p(w₂|w₁) = λ·c₁₂/c₁ + (1−λ)·c₂/N, all five λ from ONE count
  *    scan (the λ grid is a broadcast fan over the same count tables).
  *    Consumer: q543's CCNet perplexity filter and q222's Dirichlet LM
  *    — the smoothing-family calibration both assume.
  *  - q568: PSI bin attribution: q534/q552 emit ONE psi_e9 per nation;
  *    the on-call question is WHICH decile moved. Re-derives q534's
  *    bin terms and reports each nation's top-2 contributing bins with
  *    their share of the nation's PSI. Consumer: the q534 drift
  *    dashboard's drill-down (same machinery, per-bin grain).
  *
  * House rules: exact integers, FixedLn with the e6 magnitude guard,
  * per-key windows only, ordered outputs.
  */
object TuningOpsQueries {

  /** q567: pinned λ grid at e2. */
  private val Lambdas = Seq(10L, 30L, 50L, 70L, 90L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G512: Jelinek–Mercer λ bake-off on held-out bigrams ────────────
    "q567_jm_smoothing" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .filter(col("lang") === "en")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bi = d.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> " +
            "struct(element_at(toks, i) as w1, element_at(toks, i + 1) as w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val train = bi.filter(col("doc_id") % 10 =!= 0)
      val held = bi.filter(col("doc_id") % 10 === 0)
      val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
      val c2 = train.groupBy("w2").agg(count(lit(1)).as("c2"))
      val nn = train.agg(count(lit(1)).as("nn"))
      val h = held.groupBy("w1", "w2").agg(count(lit(1)).as("h"))
      val lam = s.createDataFrame(Lambdas.map(Tuple1(_))).toDF("lam_e2")
      val p = h
        .join(c12, Seq("w1", "w2"), "left").na.fill(0L, Seq("c12"))
        .join(c1, Seq("w1"), "left").na.fill(0L, Seq("c1"))
        .join(c2, Seq("w2"), "left").na.fill(0L, Seq("c2"))
        .crossJoin(broadcast(nn)).crossJoin(broadcast(lam))
        // p at e9; the c1=0 leg contributes 0 (its ML term is undefined
        // on unseen history — JM's backoff keeps p > 0 via the c2 leg).
        // Each leg divides the count ratio to e9 BEFORE the λ weight
        // (ADVICE r12): the old (100−λ)·c2·1e9 intermediate overflowed
        // BIGINT once a single w2's count passed ~1e8; the ratio-first
        // order keeps every product ≤ ~9e10 for counts up to 9.2e9.
        .withColumn("p_e9", expr(
          "greatest(1L, case when c1 = 0 then 0L " +
            "else lam_e2 * (c12 * 1000000000 div c1) div 100 end " +
            "+ (100 - lam_e2) * (c2 * 1000000000 div nn) div 100)"))
        .withColumn("sc", expr("greatest(1L, 1000000000 div 1000000)"))
        .withColumn("hi", expr("1000000000 div sc"))
        .withColumn("lo", expr("greatest(1L, p_e9 div sc)"))
      val agg = graft.ops.FixedLn.lnE9(p, "hi", "lo", "lnr")
        .groupBy("lam_e2")
        .agg(sum("h").as("n_heldout"),
          expr("sum(h * lnr) div sum(h)").as("nll_per_bigram_e9"))
      // winner via a broadcast 1-row min, not a global window (the
      // WindowSweepSpec shape) — the 5-row grid doesn't need one
      val mn = agg.agg(min("nll_per_bigram_e9").as("mn"))
      agg.crossJoin(broadcast(mn))
        .withColumn("best", expr(
          "case when nll_per_bigram_e9 = mn then 1L else 0L end"))
        .drop("mn")
        .orderBy("lam_e2")
    }),

    // ── G513: PSI bin attribution (q534's drill-down) ──────────────────
    // Reads q534's landed mid-split decile-bin fixture (r12 verdict #5)
    // instead of re-deriving the order-grain census — the drill-down is
    // a per-bin re-fold of the SAME 250-row bin table.
    "q568_psi_attribution" -> ((s, dir) => {
      val bc = MonitorOpsQueries.psiMidBins(s, dir)
      val tot = bc.groupBy("g").agg(sum("np").as("tp"), sum("nq").as("tq"),
        count(lit(1)).as("nbins"))
      val sh = bc.join(tot, Seq("g"))
        .withColumn("p", expr("greatest(1L, (np + 1) * 1000000 div (tp + nbins))"))
        .withColumn("q", expr("greatest(1L, (nq + 1) * 1000000 div (tq + nbins))"))
      val terms = graft.ops.FixedLn.lnE9(
          sh.withColumn("hi", greatest(col("p"), col("q")))
            .withColumn("lo", least(col("p"), col("q"))),
          "hi", "lo", "lnhl")
        .withColumn("term_e9", expr("abs(p - q) * lnhl div 1000000"))
      val gsum = terms.groupBy("g").agg(sum("term_e9").as("psi_e9"))
      terms.join(gsum, Seq("g"))
        .withColumn("share_e4", expr(
          "term_e9 * 10000 div greatest(psi_e9, 1L)"))
        .withColumn("rk", row_number().over(Window.partitionBy("g")
          .orderBy(col("term_e9").desc, col("bin"))).cast("long"))
        .filter(col("rk") <= 2)
        .withColumn("direction", expr(
          "case when q >= p then 'inflow' else 'outflow' end"))
        .select("g", "rk", "bin", "np", "nq", "term_e9", "share_e4",
          "direction")
        .orderBy("g", "rk")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q567_jm_smoothing" -> {
      val lamVals = Lambdas.map(l => s"(CAST($l AS BIGINT))").mkString(", ")
      s"""WITH d AS MATERIALIZED (SELECT doc_id, ${sqlTokens("text")} AS toks
        |  FROM documents WHERE lang = 'en'),
        |bi AS MATERIALIZED (SELECT doc_id,
        |    UNNEST(toks[1:len(toks) - 1]) AS w1,
        |    UNNEST(toks[2:len(toks)]) AS w2
        |  FROM d WHERE len(toks) >= 2),
        |train AS MATERIALIZED (SELECT * FROM bi WHERE doc_id % 10 != 0),
        |held AS MATERIALIZED (SELECT * FROM bi WHERE doc_id % 10 = 0),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM train GROUP BY 1, 2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY 1),
        |c2 AS (SELECT w2, COUNT(*) AS c2 FROM train GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS nn FROM train),
        |h AS (SELECT w1, w2, COUNT(*) AS h FROM held GROUP BY 1, 2),
        |lam(lam_e2) AS (VALUES $lamVals),
        |p0 AS (SELECT h.w1, h.w2, h.h, lam.lam_e2, nn.nn,
        |    COALESCE(c12.c12, 0) AS c12, COALESCE(c1.c1, 0) AS c1,
        |    COALESCE(c2.c2, 0) AS c2
        |  FROM h CROSS JOIN lam CROSS JOIN nn
        |  LEFT JOIN c12 ON h.w1 = c12.w1 AND h.w2 = c12.w2
        |  LEFT JOIN c1 ON h.w1 = c1.w1
        |  LEFT JOIN c2 ON h.w2 = c2.w2),
        |p1 AS (SELECT *, GREATEST(1,
        |    CASE WHEN c1 = 0 THEN 0
        |      ELSE lam_e2 * (c12 * 1000000000 // c1) // 100 END
        |    + (100 - lam_e2) * (c2 * 1000000000 // nn) // 100) AS p_e9
        |  FROM p0),
        |p2 AS (SELECT *, GREATEST(1, 1000000000 // 1000000) AS sc FROM p1),
        |p3 AS (SELECT *, 1000000000 // sc AS hi,
        |    GREATEST(1, p_e9 // sc) AS lo FROM p2),
        |${graft.ops.FixedLn.sqlLnE9Stages("p3", "hi", "lo", "lnr", "pj")},
        |agg AS (SELECT lam_e2, SUM(h) AS n_heldout,
        |    SUM(h * lnr) // SUM(h) AS nll_per_bigram_e9
        |  FROM pj12 GROUP BY lam_e2)
        |SELECT CAST(lam_e2 AS BIGINT) AS lam_e2,
        |  CAST(n_heldout AS BIGINT) AS n_heldout,
        |  CAST(nll_per_bigram_e9 AS BIGINT) AS nll_per_bigram_e9,
        |  CAST(CASE WHEN nll_per_bigram_e9 =
        |      MIN(nll_per_bigram_e9) OVER () THEN 1 ELSE 0 END AS BIGINT)
        |    AS best
        |FROM agg ORDER BY lam_e2""".stripMargin
    },

    "q568_psi_attribution" ->
      s"""WITH od AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
        |      AS dn,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS y,
        |    o.o_orderkey AS ok
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |mid AS (SELECT (MIN(dn) + MAX(dn)) // 2 AS mid FROM od),
        |base AS MATERIALIZED (SELECT od.* FROM od, mid WHERE dn <= mid),
        |cur AS MATERIALIZED (SELECT od.* FROM od, mid WHERE dn > mid),
        |nb AS (SELECT g, COUNT(*) AS n_base FROM base GROUP BY g),
        |ranked AS (SELECT g, y, ROW_NUMBER() OVER
        |    (PARTITION BY g ORDER BY y, ok) AS rn FROM base),
        |targets AS (SELECT g, (i * n_base + 9) // 10 AS tr
        |  FROM nb, (SELECT UNNEST(range(1, 10)) AS i)),
        |edges AS MATERIALIZED (SELECT r.g, list_sort(list(r.y)) AS edges
        |  FROM ranked r JOIN targets t ON r.g = t.g AND r.rn = t.tr
        |  GROUP BY r.g),
        |bb AS (SELECT b.g,
        |    1 + len(list_filter(e.edges, x -> x < b.y)) AS bin, COUNT(*) AS np
        |  FROM base b JOIN edges e ON b.g = e.g GROUP BY 1, 2),
        |cb AS (SELECT c.g,
        |    1 + len(list_filter(e.edges, x -> x < c.y)) AS bin, COUNT(*) AS nq
        |  FROM cur c JOIN edges e ON c.g = e.g GROUP BY 1, 2),
        |bcx AS (SELECT COALESCE(bb.g, cb.g) AS g,
        |    COALESCE(bb.bin, cb.bin) AS bin,
        |    COALESCE(np, 0) AS np, COALESCE(nq, 0) AS nq
        |  FROM bb FULL JOIN cb ON bb.g = cb.g AND bb.bin = cb.bin),
        |tot AS (SELECT g, SUM(np) AS tp, SUM(nq) AS tq, COUNT(*) AS nbins
        |  FROM bcx GROUP BY g),
        |sh AS (SELECT bcx.g, bcx.bin, bcx.np, bcx.nq,
        |    GREATEST(1, (np + 1) * 1000000 // (tp + nbins)) AS p,
        |    GREATEST(1, (nq + 1) * 1000000 // (tq + nbins)) AS q
        |  FROM bcx JOIN tot ON bcx.g = tot.g),
        |shc AS (SELECT *, GREATEST(p, q) AS hi, LEAST(p, q) AS lo FROM sh),
        |${graft.ops.FixedLn.sqlLnE9Stages("shc", "hi", "lo", "lnhl", "lx")},
        |terms AS MATERIALIZED (SELECT g, bin, np, nq, p, q,
        |    ABS(p - q) * lnhl // 1000000 AS term_e9 FROM lx12),
        |gsum AS (SELECT g, SUM(term_e9) AS psi_e9 FROM terms GROUP BY g),
        |rk AS (SELECT t.*, gsum.psi_e9,
        |    ROW_NUMBER() OVER (PARTITION BY t.g
        |      ORDER BY t.term_e9 DESC, t.bin) AS rk
        |  FROM terms t JOIN gsum ON t.g = gsum.g)
        |SELECT CAST(g AS BIGINT) AS g, CAST(rk AS BIGINT) AS rk,
        |  CAST(bin AS BIGINT) AS bin, CAST(np AS BIGINT) AS np,
        |  CAST(nq AS BIGINT) AS nq, CAST(term_e9 AS BIGINT) AS term_e9,
        |  CAST(term_e9 * 10000 // GREATEST(psi_e9, 1) AS BIGINT)
        |    AS share_e4,
        |  CASE WHEN q >= p THEN 'inflow' ELSE 'outflow' END AS direction
        |FROM rk WHERE rk <= 2 ORDER BY g, rk""".stripMargin
  )
}
