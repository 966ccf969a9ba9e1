package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostics-ops wave (round 11): the adequacy test, the index
  * staleness monitor, and the model-comparison test a deployed
  * forecast + retrieval stack runs on its own artifacts.
  *
  * Reference intent — every query names its consumer (r10 verdict
  * "next" #4):
  *  - q546: Ljung–Box portmanteau test (Ljung & Box 1978) on the
  *    weekday-mean model's in-sample residuals, lags 1..7:
  *    Q = n(n+2)·Σ_k r_k²/(n−k). If residuals still carry
  *    autocorrelation, the model missed structure — THE standard
  *    adequacy check before trusting a forecaster. Exact integers:
  *    mean-centering by floor mean, r_k at e6 via sign-explicit div,
  *    Q at e6 against the χ²(7) 95% critical value 14.067 as a pinned
  *    literal. Consumer: the q31/q32 retrain loop — q535's tracking
  *    signal says WHEN bias appears; Ljung–Box says whether the model
  *    family is adequate at all (family: q166 lag-1 autocorr, q401
  *    EWMA chart).
  *  - q547: IVF assignment-churn monitor — one Lloyd step (q132's
  *    exact integer kernel, verbatim discipline) and the share of
  *    vectors whose nearest cell CHANGES, per-cell in/out flows and
  *    size skew before/after. Churn is the staleness signal that
  *    triggers index rebuilds: high churn = the coarse quantizer no
  *    longer matches the data. Consumer: q38/q531's IVF index
  *    maintenance (family: q142 centroid drift measures the DATA
  *    moving; this measures the INDEX decaying).
  *  - q548: Diebold–Mariano test (Diebold & Mariano 1995) comparing
  *    the weekday-mean arm against the global-mean arm on the 28-day
  *    holdout: loss differentials d_t = |e_dow| − |e_glob|,
  *    DM² = (n−1)·(Σd)² / (n·Σd² − (Σd)²) at e6 (the q186 z² trick:
  *    emit the squared statistic, no sqrt), decided at χ²(1) 95% =
  *    3.841. Consumer: q524's Bates–Granger ensemble — DM is the test
  *    that says whether an arm EARNS its weight (family: q328 FVA
  *    states the delta; DM states its significance).
  *
  * House rules: exact integers, sign-explicit sdiv, DECIMAL(38,0)
  * lifts, per-key windows only, ordered outputs.
  */
object DiagnosticsOpsQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** χ² 95% critical values as e6 literals. */
  private val Chi2_7_e6 = 14067140L  // χ²(7)
  private val Chi2_1_e6 = 3841459L   // χ²(1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G491: Ljung–Box residual adequacy test (lags 1..7) ─────────────
    "q546_ljung_box" -> ((s, dir) => {
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
      val fit = nd.groupBy("g", "dow").agg(expr("sum(y) div count(1)").as("f"))
      val e0 = nd.join(fit, Seq("g", "dow"))
        .select(col("g"), col("dn"), (col("y") - col("f")).as("e"))
      val mean = e0.groupBy("g").agg(expr(sdiv("sum(e)", "count(1)")).as("me"),
        count(lit(1)).as("n"))
      // day-INDEX adjacency (rank in day order), so lag k means "k
      // observations apart" — the LB definition over the residual series
      val er = e0.join(broadcast(mean), Seq("g"))
        .withColumn("ec", col("e") - col("me"))
        .withColumn("t", row_number().over(
          Window.partitionBy("g").orderBy("dn")))
        .select("g", "t", "ec", "n")
      val den = er.groupBy("g")
        .agg(max("n").as("n"), sum(expr("ec * ec")).as("s0"))
      val lags = er.select(col("g"), col("t"), col("ec"))
      // lag-k pairs as an EQUI join on (g, t + k) — q261's acf shape,
      // never a per-group range join
      val rk = lags.withColumn("k", explode(expr("sequence(1, 7)")))
        .join(lags.select(col("g").as("g2"), col("t").as("t2"),
          col("ec").as("ec2")),
          col("g") === col("g2") && col("t2") === col("t") + col("k"))
        .select(col("g"), col("k"), expr("ec * ec2").as("prod"))
        .groupBy("g", "k").agg(sum("prod").as("numk"))
        .join(broadcast(den), Seq("g"))
        // numk·1e6 can reach ~2e23 — DECIMAL(38,0) lift before the div
        .withColumn("r6", expr("cast(" + sdiv(
          "cast(numk as decimal(38, 0)) * 1000000",
          "greatest(cast(s0 as decimal(38, 0)), cast(1 as decimal(38, 0)))") +
          " as bigint)"))
        .withColumn("term", expr("(r6 * r6) div (n - k)"))
      rk.groupBy("g")
        .agg(max("n").as("n_days"),
          expr("max(n) * (max(n) + 2) * sum(term) div 1000000")
            .as("q_lb_e6"),
          max(expr("abs(r6)")).as("max_abs_r6"),
          min_by(col("k"), struct(negate(abs(col("r6"))), col("k")))
            .cast("long").as("worst_lag"))
        .withColumn("adequate", expr(
          s"case when q_lb_e6 < ${Chi2_7_e6}L then 1L else 0L end"))
        .orderBy("g")
    }),

    // ── G492: IVF assignment-churn monitor (index staleness) ───────────
    "q547_ivf_churn" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(graft.functions.VectorFunctions.asDouble(col("embedding")))
            .as(Seq("p", "e")))
        .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
          round(col("e") * 1000000).cast("long").as("v6"))
      def assign(cents: DataFrame): DataFrame =
        x.join(broadcast(cents), Seq("i"))
          .groupBy("vec_id", "cid")
          .agg(sum((col("v6") - col("c6")) * (col("v6") - col("c6"))).as("d2"))
          .groupBy("vec_id")
          .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val seeds = x.filter(col("vec_id").between(0, 7))
        .select(col("vec_id").as("cid"), col("i"), col("v6").as("c6"))
      val a0 = assign(seeds)
      val newCents = a0.join(x, Seq("vec_id"))
        .groupBy("cid", "i")
        .agg(expr(sdiv("sum(v6)", "count(1)")).as("c6"))
      val a1 = assign(newCents)
      val moved = a0.withColumnRenamed("cid", "c_old")
        .join(a1.withColumnRenamed("cid", "c_new"), Seq("vec_id"))
      moved.groupBy(col("c_old").as("cell"))
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("c_new") =!= col("c_old"), 1L).otherwise(0L))
            .as("n_out"))
        .join(moved.groupBy(col("c_new").as("cell"))
          .agg(count(lit(1)).as("n_after"),
            sum(when(col("c_new") =!= col("c_old"), 1L).otherwise(0L))
              .as("n_in")), Seq("cell"), "full")
        .na.fill(0L, Seq("n_before", "n_out", "n_after", "n_in"))
        .withColumn("churn_e4", expr(
          "n_out * 10000 div greatest(n_before, 1L)"))
        .orderBy("cell")
    }),

    // ── G493: Diebold–Mariano forecast-comparison test ─────────────────
    "q548_diebold_mariano" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val cut = nd.agg(expr("max(dn) - 28").as("cut"))
      val base = nd.crossJoin(broadcast(cut))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
      val train = base.filter(col("dn") <= col("cut"))
      val fDow = train.groupBy("g", "dow").agg(expr("sum(y) div count(1)").as("fd"))
      val fAll = train.groupBy("g").agg(expr("sum(y) div count(1)").as("fa"))
      val d = base.filter(col("dn") > col("cut"))
        .join(fDow, Seq("g", "dow"), "left").join(fAll, Seq("g"))
        .withColumn("d", abs(col("y") - coalesce(col("fd"), col("fa"))) -
          abs(col("y") - col("fa")))
      d.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("d").as("sd"),
          sum(expr("d * d")).as("sdd"))
        .withColumn("dm2_e6", expr("cast(" +
          sdiv(s"(n - 1) * cast(sd as $dec) * sd * 1000000",
            s"greatest(cast(n as $dec) * sdd - cast(sd as $dec) * sd, " +
              s"cast(1 as $dec))") + " as bigint)"))
        .withColumn("mean_d", expr(sdiv("sd", "n")))
        .withColumn("better_arm", expr(
          "case when sd < 0 then 'dow_mean' when sd > 0 then 'global_mean' " +
            "else 'tie' end"))
        .withColumn("significant", expr(
          s"case when dm2_e6 >= ${Chi2_1_e6}L then 1L else 0L end"))
        .select("g", "n", "mean_d", "dm2_e6", "better_arm", "significant")
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q546_ljung_box" ->
      s"""WITH nd AS (SELECT c.c_nationkey AS g,
         |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
         |      AS dn,
         |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |nd2 AS (SELECT *, ((dn % 7) + 7) % 7 AS dow FROM nd),
         |fit AS (SELECT g, dow, SUM(y) // COUNT(*) AS f FROM nd2
         |  GROUP BY 1, 2),
         |e0 AS (SELECT nd2.g, nd2.dn, nd2.y - fit.f AS e
         |  FROM nd2 JOIN fit ON nd2.g = fit.g AND nd2.dow = fit.dow),
         |m AS (SELECT g, ${sdivSql("SUM(e)", "COUNT(*)")} AS me,
         |    COUNT(*) AS n FROM e0 GROUP BY g),
         |er AS MATERIALIZED (SELECT e0.g, e0.e - m.me AS ec, m.n,
         |    ROW_NUMBER() OVER (PARTITION BY e0.g ORDER BY e0.dn) AS t
         |  FROM e0 JOIN m ON e0.g = m.g),
         |den AS (SELECT g, MAX(n) AS n, SUM(ec * ec) AS s0 FROM er
         |  GROUP BY g),
         |rk AS (SELECT a.g, kk.k, SUM(a.ec * b.ec) AS numk
         |  FROM er a CROSS JOIN (SELECT UNNEST(range(1, 8)) AS k) kk
         |  JOIN er b ON a.g = b.g AND b.t = a.t + kk.k
         |  GROUP BY 1, 2),
         |r6 AS (SELECT rk.g, rk.k, den.n,
         |    CAST(${sdivSql("CAST(rk.numk AS HUGEINT) * 1000000",
            "GREATEST(CAST(den.s0 AS HUGEINT), 1)")} AS BIGINT) AS r6
         |  FROM rk JOIN den ON rk.g = den.g),
         |terms AS (SELECT g, k, n, r6, (r6 * r6) // (n - k) AS term FROM r6),
         |wl AS (SELECT g, k AS worst_lag FROM
         |  (SELECT g, k, ROW_NUMBER() OVER (PARTITION BY g
         |     ORDER BY ABS(r6) DESC, k) AS rn FROM terms) WHERE rn = 1)
         |SELECT CAST(t.g AS BIGINT) AS g, CAST(MAX(n) AS BIGINT) AS n_days,
         |  CAST(MAX(n) * (MAX(n) + 2) * SUM(term) // 1000000 AS BIGINT)
         |    AS q_lb_e6,
         |  CAST(MAX(ABS(r6)) AS BIGINT) AS max_abs_r6,
         |  CAST(MAX(wl.worst_lag) AS BIGINT) AS worst_lag,
         |  CAST(CASE WHEN MAX(n) * (MAX(n) + 2) * SUM(term) // 1000000
         |    < $Chi2_7_e6 THEN 1 ELSE 0 END AS BIGINT) AS adequate
         |FROM terms t JOIN wl ON t.g = wl.g GROUP BY t.g ORDER BY t.g""".stripMargin,

    "q547_ivf_churn" -> {
      def assignSql(cents: String, out: String): String =
        s"""${out}d AS (SELECT x.vec_id, c.cid,
           |    SUM((x.v6 - c.c6) * (x.v6 - c.c6)) AS d2
           |  FROM x JOIN $cents c ON x.i = c.i GROUP BY 1, 2),
           |$out AS MATERIALIZED (SELECT vec_id, cid FROM
           |  (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
           |     ORDER BY d2, cid) AS rn FROM ${out}d) WHERE rn = 1)"""
          .stripMargin
      s"""WITH x AS MATERIALIZED (SELECT vec_id,
         |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
         |    CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 1000000)
         |      AS BIGINT) AS v6
         |  FROM embeddings),
         |seeds AS (SELECT vec_id AS cid, i, v6 AS c6 FROM x
         |  WHERE vec_id BETWEEN 0 AND 7),
         |${assignSql("seeds", "a0")},
         |nc AS (SELECT a0.cid, x.i,
         |    ${sdivSql("SUM(x.v6)", "COUNT(*)")} AS c6
         |  FROM a0 JOIN x ON a0.vec_id = x.vec_id GROUP BY 1, 2),
         |${assignSql("nc", "a1")},
         |mv AS (SELECT a0.vec_id, a0.cid AS c_old, a1.cid AS c_new
         |  FROM a0 JOIN a1 ON a0.vec_id = a1.vec_id),
         |bef AS (SELECT c_old AS cell, COUNT(*) AS n_before,
         |    SUM(CASE WHEN c_new != c_old THEN 1 ELSE 0 END) AS n_out
         |  FROM mv GROUP BY 1),
         |aft AS (SELECT c_new AS cell, COUNT(*) AS n_after,
         |    SUM(CASE WHEN c_new != c_old THEN 1 ELSE 0 END) AS n_in
         |  FROM mv GROUP BY 1)
         |SELECT CAST(COALESCE(bef.cell, aft.cell) AS BIGINT) AS cell,
         |  CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
         |  CAST(COALESCE(n_out, 0) AS BIGINT) AS n_out,
         |  CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
         |  CAST(COALESCE(n_in, 0) AS BIGINT) AS n_in,
         |  CAST(COALESCE(n_out, 0) * 10000
         |    // GREATEST(COALESCE(n_before, 0), 1) AS BIGINT) AS churn_e4
         |FROM bef FULL JOIN aft ON bef.cell = aft.cell
         |ORDER BY cell""".stripMargin
    },

    "q548_diebold_mariano" ->
      s"""WITH nd AS (SELECT c.c_nationkey AS g,
         |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
         |      AS dn,
         |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |ct AS (SELECT MAX(dn) - 28 AS cut FROM nd),
         |base AS MATERIALIZED (SELECT nd.*, ((dn % 7) + 7) % 7 AS dow,
         |    ct.cut FROM nd, ct),
         |fd AS (SELECT g, dow, SUM(y) // COUNT(*) AS fd FROM base
         |  WHERE dn <= cut GROUP BY 1, 2),
         |fa AS (SELECT g, SUM(y) // COUNT(*) AS fa FROM base
         |  WHERE dn <= cut GROUP BY 1),
         |d AS (SELECT b.g,
         |    ABS(b.y - COALESCE(fd.fd, fa.fa)) - ABS(b.y - fa.fa) AS d
         |  FROM base b LEFT JOIN fd ON b.g = fd.g AND b.dow = fd.dow
         |  JOIN fa ON b.g = fa.g WHERE b.dn > b.cut),
         |agg AS (SELECT g, COUNT(*) AS n, SUM(d) AS sd, SUM(d * d) AS sdd
         |  FROM d GROUP BY g),
         |fin AS (SELECT g, n, sd,
         |    CAST(${sdivSql(
            "(n - 1) * CAST(sd AS HUGEINT) * sd * 1000000",
            "GREATEST(CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd, 1)")}
         |      AS BIGINT) AS dm2_e6
         |  FROM agg)
         |SELECT CAST(g AS BIGINT) AS g, CAST(n AS BIGINT) AS n,
         |  CAST(${sdivSql("sd", "n")} AS BIGINT) AS mean_d,
         |  dm2_e6,
         |  CASE WHEN sd < 0 THEN 'dow_mean' WHEN sd > 0 THEN 'global_mean'
         |    ELSE 'tie' END AS better_arm,
         |  CAST(CASE WHEN dm2_e6 >= $Chi2_1_e6 THEN 1 ELSE 0 END AS BIGINT)
         |    AS significant
         |FROM fin ORDER BY g""".stripMargin
  )
}
