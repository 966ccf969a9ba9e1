package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Advisory-ops wave (round 12, fourth wave): the three "how much do I
  * need" estimators an operating team runs before spending — query
  * difficulty before expansion, data before acquisition, replicas
  * before deployment.
  *
  * Reference intent — every query names its consumer:
  *  - q562: Clarity score (Cronen-Townsend, Zhou & Croft, SIGIR 2002)
  *    — KL divergence between the top-10-retrieved-docs language model
  *    and the collection language model. The standard query-performance
  *    predictor: expand (q545's RM3) only the unclear queries.
  *    Consumer: the q545 expansion loop's gate, over q221's exact
  *    integer Okapi rationals verbatim.
  *  - q563: learning-curve extrapolation (Hestness et al. 2017;
  *    Kaplan et al. 2020): held-out unigram-LM NLL at nested 10/20/40/
  *    80 % training subsets, power-law slope from an exact log-log OLS
  *    (FixedLn on both axes — constant rescale offsets cancel in the
  *    slope). Consumer: q457's Hoeffding sample-size advisor — this is
  *    its empirical twin for the q543 LM family.
  *  - q564: Erlang-C staffing (Erlang 1917): P(wait) per replica count
  *    for the forecast-serving API, from the last-28-day arrival rate.
  *    The a^k/k! ladder is ONE integer fold shared by every replica
  *    count (t_k is c-independent). Consumer: the reference's
  *    forecast-service deployment (its compose file pins replicas by
  *    guesswork; this is the queueing answer).
  *
  * House rules: exact integer arithmetic, FixedLn for logarithms,
  * DECIMAL(38,0) where products exceed BIGINT, ordered outputs.
  */
object AdvisoryOpsQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** q562: pinned query set (Q1 is q545's seed). */
  private val Queries562: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "window", "merge"),
    2L -> Seq("hash", "join"),
    3L -> Seq("slow", "scan", "table"))

  /** q563: nested subset sizes as md5-bucket prefixes (of 10). */
  private val CurvePrefixes = Seq(1L, 2L, 4L, 8L)

  /** q564: pinned service rate (requests/day one replica sustains) and
    * replica sweep bound. */
  private val SvcPerDay = 20L
  private val MaxReplicas = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G507: Clarity score — query-performance prediction ─────────────
    "q562_clarity_score" -> ((s, dir) => {
      val x = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val dl = x.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      val coll = x.groupBy("tok").agg(count(lit(1)).as("cw"))
      val terms = s.createDataFrame(
        Queries562.flatMap { case (q, ts) => ts.map(t => (q, t)) })
        .toDF("qid", "tok")
      // q221/q545's exact Okapi rationals, per (qid, doc)
      val tf = x.join(broadcast(terms), Seq("tok"))
        .groupBy("qid", "doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("qid", "tok").agg(count(lit(1)).as("df"))
      val top = tf.join(broadcast(df), Seq("qid", "tok"))
        .join(dl, "doc_id").crossJoin(broadcast(corpus))
        .withColumn("idf_e6",
          expr("(1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1)"))
        .withColumn("tfsat_e6",
          expr("(1000000 * 22 * cast(tf as decimal(38,0)) * sum_dl) div " +
            "(10 * cast(tf as decimal(38,0)) * sum_dl + 3*sum_dl + 9 * cast(dl as decimal(38,0)) * n_docs)"))
        .withColumn("contrib_e6", expr("idf_e6 * tfsat_e6 div 1000000"))
        .groupBy("qid", "doc_id")
        .agg(sum("contrib_e6").as("score_e6"))
        .withColumn("rk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("score_e6").desc, col("doc_id"))))
        .filter(col("rk") <= 10)
        .select("qid", "doc_id")
      // query LM: MLE over the concatenated top-10 docs; collection LM:
      // global token shares. Both e6, clipped ≥ 1 (q534's discipline).
      val qtok = x.join(top, Seq("doc_id"))
        .groupBy("qid", "tok").agg(count(lit(1)).as("qw"))
      val qtot = qtok.groupBy("qid").agg(sum("qw").as("qn"))
      val ctot = coll.agg(sum("cw").as("cn"))
      val sh = qtok.join(qtot, Seq("qid"))
        .join(broadcast(coll), Seq("tok")).crossJoin(broadcast(ctot))
        .withColumn("p", expr("greatest(1L, qw * 1000000 div qn)"))
        .withColumn("q", expr("greatest(1L, cw * 1000000 div cn)"))
        .withColumn("hi", greatest(col("p"), col("q")))
        .withColumn("lo", least(col("p"), col("q")))
      graft.ops.FixedLn.lnE9(sh, "hi", "lo", "lnr")
        .withColumn("term", expr(
          "case when p >= q then p * lnr else -(p * lnr) end"))
        .groupBy("qid")
        .agg(count(lit(1)).as("vocab"),
          expr(sdiv("sum(term)", "1000000")).as("clarity_e9"))
        .orderBy("qid")
    }),

    // ── G508: learning-curve slope from nested training subsets ───────
    "q563_learning_curve" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      // spread: train/held branches each re-tokenize inside the
      // single-row-group scan's one task (guide §2.5)
      val toks = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val train = toks.filter(col("doc_id") % 10 =!= 0)
        .withColumn("b", expr(
          "cast(conv(substring(md5(concat('lc:', cast(doc_id as string))), " +
            "1, 6), 16, 10) as bigint) % 10"))
      val held = toks.filter(col("doc_id") % 10 === 0)
      // localCheckpoint (optimization r15, guide §3.3): `h` feeds both
      // the held-out total and the per-token terms (lazy, the held-side
      // tokenize ran twice); `ck` feeds both the per-subset totals and
      // the terms join (lazy, the train-side tokenize + bucket counts
      // ran twice). Both are vocab-grain (tiny) frames.
      val h = held.groupBy("tok").agg(count(lit(1)).as("h"))
        .localCheckpoint()
      val htot = h.agg(sum("h").as("ht"))
      val cb = train.groupBy("tok", "b").agg(count(lit(1)).as("cnt"))
      val ks = s.createDataFrame(CurvePrefixes.map(Tuple1(_))).toDF("k")
      // subset counts: buckets < k, all four subsets from ONE scan
      val ck = cb.crossJoin(broadcast(ks)).filter(col("b") < col("k"))
        .groupBy("k", "tok").agg(sum("cnt").as("c"))
        .localCheckpoint()
      val nk = ck.groupBy("k").agg(sum("c").as("nn"), count(lit(1)).as("vv"))
      val terms = h.crossJoin(broadcast(nk))
        .join(ck, Seq("k", "tok"), "left").na.fill(0L, Seq("c"))
        .withColumn("sc", expr("greatest(1L, (nn + vv) div 1000000)"))
        .withColumn("hi", expr("(nn + vv) div sc"))
        .withColumn("lo", expr("greatest(1L, (c + 1) div sc)"))
      val nll = graft.ops.FixedLn.lnE9(terms, "hi", "lo", "lnr")
        .groupBy("k").agg(max("nn").as("n_train_tokens"),
          sum(expr("h * lnr")).as("nll_e9"))
        .crossJoin(broadcast(htot))
        .withColumn("nll_per_tok_e9", expr("nll_e9 div ht"))
      // log-log axes via FixedLn with the q541-style magnitude guard
      // (ADVICE r12): a raw hi = n_train_tokens saturates the kernel's
      // k ≤ 21 ladder at ~4.2e6 tokens and overflows the atanh stage at
      // ~1.9e7. Split ln(v) = ln(v div sc) + ln(sc) with
      // sc = greatest(1, v div 1e6) — both legs stay < 2^22 for any
      // corpus below ~4e12 tokens; both engines run the identical split.
      val x0 = nll.withColumn("xsc",
        expr("greatest(1L, n_train_tokens div 1000000)"))
      val x1 = graft.ops.FixedLn.lnE9(
        x0.withColumn("hi", expr("greatest(1L, n_train_tokens div xsc)"))
          .withColumn("lo", lit(1L)), "hi", "lo", "x1").drop("hi", "lo")
      val x2 = graft.ops.FixedLn.lnE9(
        x1.withColumn("hi", col("xsc")).withColumn("lo", lit(1L)),
        "hi", "lo", "x2").drop("hi", "lo")
      val ax0 = x2.withColumn("x", expr("x1 + x2"))
        .drop("x1", "x2", "xsc")
      val z0 = ax0.withColumn("zraw", expr("nll_per_tok_e9 div 1000"))
        .withColumn("zsc", expr("greatest(1L, zraw div 1000000)"))
      val z1 = graft.ops.FixedLn.lnE9(
        z0.withColumn("hi", expr("greatest(1L, zraw div zsc)"))
          .withColumn("lo", lit(1L)), "hi", "lo", "z1").drop("hi", "lo")
      val z2 = graft.ops.FixedLn.lnE9(
        z1.withColumn("hi", col("zsc")).withColumn("lo", lit(1L)),
        "hi", "lo", "z2").drop("hi", "lo")
      // localCheckpoint: `ax` (4 rows) feeds the slope regression AND
      // the final projection — lazy, the whole vocab-scale NLL + FixedLn
      // pipeline above re-ran for each
      val ax = z2.withColumn("z", expr("z1 + z2"))
        .drop("z1", "z2", "zsc", "zraw")
        .localCheckpoint()
      val slope = ax.agg(count(lit(1)).as("np"),
          sum(expr(s"cast(x as $dec)")).as("sx"),
          sum(expr(s"cast(z as $dec)")).as("sz"),
          sum(expr(s"cast(x as $dec) * z")).as("sxz"),
          sum(expr(s"cast(x as $dec) * x")).as("sxx"))
        .withColumn("slope_e6", expr(
          "cast(" + sdiv("(np * sxz - sx * sz) * 1000000",
            "np * sxx - sx * sx") + " as bigint)"))
        .select("slope_e6")
      ax.crossJoin(broadcast(slope))
        .withColumn("frac_pct", col("k") * 10)
        .select("frac_pct", "n_train_tokens", "nll_per_tok_e9", "slope_e6")
        .orderBy("frac_pct")
    }),

    // ── G509: Erlang-C replica staffing for the serving API ────────────
    "q564_erlang_c" -> ((s, dir) => {
      val lam = Tables.orders(s, dir)
        .select(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .crossJoin(broadcast(Tables.orders(s, dir).agg(
          expr("max(datediff(to_date(o_orderdate), date '1970-01-01')) - 28")
            .as("cut"))))
        .filter(col("dn") > col("cut"))
        .agg(count(lit(1)).as("n28"))
        .withColumn("lam_e6", expr("n28 * 1000000 div 28"))
        .withColumn("a_e6", expr(s"lam_e6 div $SvcPerDay"))
      // the a^k/k! ladder: ONE integer fold building the whole array —
      // t_0 = 1 (e9); t_k = t_{k-1}·a/k. Erlang-C only needs the t_k
      // RATIOS, so whenever a step's raw value passes 1e9 the whole
      // array is renormalized by it (ADVICE r12: the unrenormalized
      // t_{k-1}·a_e6 product overflowed BIGINT at a_e6 ≳ 1e7, ~sf0.3).
      // Post-renorm every entry is ≤ 1e9 and every intermediate stays
      // ≤ 1e9·a_e6 — exact for arrival rates up to ~9e9 req-e6/day.
      val vraw = "element_at(acc, -1) * a_e6 div (cast(k as bigint) * 1000000)"
      val lad = lam.withColumn("ts", expr(
        s"aggregate(sequence(1, $MaxReplicas), array(1000000000L), " +
          s"(acc, k) -> case when $vraw > 1000000000L " +
          s"then concat(transform(acc, x -> x * 1000000000L div ($vraw)), " +
          "array(1000000000L)) " +
          s"else concat(acc, array($vraw)) end)"))
      // s_below = Σ_{j<k} t_j folded straight from the ladder array —
      // no window at all (a global cumsum window would be the
      // WindowSweepSpec scale-killer shape, pointless on 17 rows)
      val tk = lad.select(col("a_e6"), col("ts"),
        posexplode(col("ts")).as(Seq("k", "t")))
      val cum = tk.withColumn("s_below", expr(
          "aggregate(slice(ts, 1, k), 0L, (a, b) -> a + b)"))
        .drop("ts")
        .filter(col("k").between(1, MaxReplicas))
      cum
        .withColumn("c", col("k").cast("long"))
        .withColumn("saturated", expr(
          "case when a_e6 >= c * 1000000 then 1L else 0L end"))
        .withColumn("num", expr(
          "case when saturated = 1 then 0L " +
            "else t * (c * 1000000) div (c * 1000000 - a_e6) end"))
        // num·1e6 in DECIMAL(38,0): near saturation num ≈ t·c·1e6 can
        // reach ~1.6e16 and the e6 lift would wrap BIGINT (house rule)
        .withColumn("p_wait_e6", expr(
          "case when saturated = 1 then 1000000L " +
            "else cast(num as decimal(38, 0)) * 1000000 " +
            "div (cast(s_below as decimal(38, 0)) + num) end"))
        .withColumn("util_e6", expr("a_e6 div c"))
        .withColumn("meets_slo", expr(
          "case when p_wait_e6 <= 200000 then 1L else 0L end"))
        .select("c", "a_e6", "util_e6", "saturated", "p_wait_e6", "meets_slo")
        .orderBy("c")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q562_clarity_score" -> {
      val termRows = Queries562.flatMap { case (q, ts) =>
        ts.map(t => s"($q, '$t')") }.mkString(", ")
      s"""WITH x AS MATERIALIZED (SELECT doc_id,
        |    UNNEST(${sqlTokens("text")}) AS tok FROM documents),
        |dl AS MATERIALIZED (SELECT doc_id, COUNT(*) AS dl FROM x
        |  GROUP BY doc_id),
        |corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        |coll AS MATERIALIZED (SELECT tok, COUNT(*) AS cw FROM x
        |  GROUP BY tok),
        |terms(qid, tok) AS (VALUES $termRows),
        |tf AS (SELECT t.qid, x.doc_id, x.tok, COUNT(*) AS tf
        |  FROM x JOIN terms t ON x.tok = t.tok GROUP BY 1, 2, 3),
        |df AS (SELECT qid, tok, COUNT(*) AS df FROM tf GROUP BY 1, 2),
        |sc AS (SELECT tf.qid, tf.doc_id,
        |    SUM(((1000000 * (2*n_docs - 2*df.df + 1)) // (2*df.df + 1))
        |      * ((1000000 * 22 * CAST(tf.tf AS HUGEINT) * sum_dl) //
        |         (10*CAST(tf.tf AS HUGEINT)*sum_dl + 3*sum_dl + 9*CAST(dl.dl AS HUGEINT)*n_docs))
        |      // 1000000) AS score_e6
        |  FROM tf JOIN df ON tf.qid = df.qid AND tf.tok = df.tok
        |  JOIN dl ON tf.doc_id = dl.doc_id, corpus
        |  GROUP BY tf.qid, tf.doc_id),
        |top AS MATERIALIZED (SELECT qid, doc_id FROM
        |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |       ORDER BY score_e6 DESC, doc_id) AS rk FROM sc)
        |  WHERE rk <= 10),
        |qtok AS (SELECT t.qid, x.tok, COUNT(*) AS qw
        |  FROM x JOIN top t ON x.doc_id = t.doc_id GROUP BY 1, 2),
        |qtot AS (SELECT qid, SUM(qw) AS qn FROM qtok GROUP BY qid),
        |ctot AS (SELECT SUM(cw) AS cn FROM coll),
        |sh AS (SELECT qtok.qid, qtok.tok,
        |    GREATEST(1, qw * 1000000 // qn) AS p,
        |    GREATEST(1, cw * 1000000 // cn) AS q
        |  FROM qtok JOIN qtot ON qtok.qid = qtot.qid
        |  JOIN coll ON qtok.tok = coll.tok, ctot),
        |shc AS (SELECT *, GREATEST(p, q) AS hi, LEAST(p, q) AS lo FROM sh),
        |${graft.ops.FixedLn.sqlLnE9Stages("shc", "hi", "lo", "lnr", "lx")},
        |agg AS (SELECT qid, COUNT(*) AS vocab,
        |    ${sdivSql(
               "SUM(CASE WHEN p >= q THEN p * lnr ELSE -(p * lnr) END)",
               "1000000")} AS clarity_e9
        |  FROM lx12 GROUP BY qid)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(vocab AS BIGINT) AS vocab,
        |  CAST(clarity_e9 AS BIGINT) AS clarity_e9
        |FROM agg ORDER BY qid""".stripMargin
    },

    "q563_learning_curve" -> {
      val ks = CurvePrefixes.mkString(", ")
      s"""WITH toks AS MATERIALIZED (SELECT doc_id,
        |    UNNEST(${sqlTokens("text")}) AS tok FROM documents),
        |train AS MATERIALIZED (SELECT doc_id, tok,
        |    CAST('0x' || substr(md5('lc:' || CAST(doc_id AS VARCHAR)),
        |      1, 6) AS BIGINT) % 10 AS b
        |  FROM toks WHERE doc_id % 10 != 0),
        |held AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 10 = 0),
        |h AS MATERIALIZED (SELECT tok, COUNT(*) AS h FROM held
        |  GROUP BY tok),
        |htot AS (SELECT SUM(h) AS ht FROM h),
        |cb AS (SELECT tok, b, COUNT(*) AS cnt FROM train GROUP BY 1, 2),
        |ks(k) AS (VALUES (${CurvePrefixes.map(k => s"CAST($k AS BIGINT)")
          .head}), ${CurvePrefixes.tail.map(k => s"(CAST($k AS BIGINT))")
          .mkString(", ")}),
        |ck AS MATERIALIZED (SELECT ks.k, cb.tok, SUM(cnt) AS c
        |  FROM cb CROSS JOIN ks WHERE cb.b < ks.k GROUP BY 1, 2),
        |nk AS (SELECT k, SUM(c) AS nn, COUNT(*) AS vv FROM ck GROUP BY k),
        |f0 AS (SELECT nk.k, h.tok, h.h, nk.nn, nk.vv, COALESCE(ck.c, 0) AS c
        |  FROM h CROSS JOIN nk
        |  LEFT JOIN ck ON ck.k = nk.k AND ck.tok = h.tok),
        |f1 AS (SELECT *, GREATEST(1, (nn + vv) // 1000000) AS sc FROM f0),
        |f2 AS (SELECT *, (nn + vv) // sc AS hi,
        |    GREATEST(1, (c + 1) // sc) AS lo FROM f1),
        |${graft.ops.FixedLn.sqlLnE9Stages("f2", "hi", "lo", "lnr", "pf")},
        |nll AS MATERIALIZED (SELECT k, MAX(nn) AS n_train_tokens,
        |    SUM(h * lnr) // (SELECT ht FROM htot) AS nll_per_tok_e9
        |  FROM pf12 GROUP BY k),
        |a0 AS (SELECT *, GREATEST(1, n_train_tokens // 1000000) AS xsc
        |  FROM nll),
        |a1 AS (SELECT *, GREATEST(1, n_train_tokens // xsc) AS hi,
        |    CAST(1 AS BIGINT) AS lo FROM a0),
        |${graft.ops.FixedLn.sqlLnE9Stages("a1", "hi", "lo", "x1", "qa")},
        |a2 AS (SELECT k, n_train_tokens, nll_per_tok_e9, xsc, x1,
        |    xsc AS hi, CAST(1 AS BIGINT) AS lo FROM qa12),
        |${graft.ops.FixedLn.sqlLnE9Stages("a2", "hi", "lo", "x2", "qb")},
        |a3 AS (SELECT k, n_train_tokens, nll_per_tok_e9, x1 + x2 AS x,
        |    nll_per_tok_e9 // 1000 AS zraw FROM qb12),
        |a4 AS (SELECT *, GREATEST(1, zraw // 1000000) AS zsc FROM a3),
        |a5 AS (SELECT *, GREATEST(1, zraw // zsc) AS hi,
        |    CAST(1 AS BIGINT) AS lo FROM a4),
        |${graft.ops.FixedLn.sqlLnE9Stages("a5", "hi", "lo", "z1", "qc")},
        |a6 AS (SELECT k, n_train_tokens, nll_per_tok_e9, x, z1,
        |    zsc AS hi, CAST(1 AS BIGINT) AS lo FROM qc12),
        |${graft.ops.FixedLn.sqlLnE9Stages("a6", "hi", "lo", "z2", "qd")},
        |ax AS MATERIALIZED (SELECT k, n_train_tokens, nll_per_tok_e9, x,
        |    z1 + z2 AS z FROM qd12),
        |sl AS (SELECT COUNT(*) AS np, SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(z AS HUGEINT)) AS sz,
        |    SUM(CAST(x AS HUGEINT) * z) AS sxz,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM ax),
        |slope AS (SELECT CAST(${sdivSql(
             "(np * sxz - sx * sz) * 1000000", "np * sxx - sx * sx")}
        |    AS BIGINT) AS slope_e6 FROM sl)
        |SELECT CAST(k * 10 AS BIGINT) AS frac_pct,
        |  CAST(n_train_tokens AS BIGINT) AS n_train_tokens,
        |  CAST(nll_per_tok_e9 AS BIGINT) AS nll_per_tok_e9, slope_e6
        |FROM ax, slope ORDER BY frac_pct""".stripMargin
    },

    "q564_erlang_c" ->
      s"""WITH base AS MATERIALIZED (SELECT COUNT(*) AS n28 FROM
        |    (SELECT date_diff('day', DATE '1970-01-01',
        |       CAST(o_orderdate AS DATE)) AS dn FROM orders) o,
        |    (SELECT MAX(date_diff('day', DATE '1970-01-01',
        |       CAST(o_orderdate AS DATE))) - 28 AS cut FROM orders) c
        |  WHERE o.dn > c.cut),
        |lam AS MATERIALIZED (SELECT n28, n28 * 1000000 // 28 AS lam_e6,
        |    (n28 * 1000000 // 28) // $SvcPerDay AS a_e6 FROM base),
        |lad AS MATERIALIZED (
        |  WITH RECURSIVE r(k, vs) AS (
        |    SELECT 0, [CAST(1000000000 AS BIGINT)]
        |    UNION ALL
        |    SELECT k + 1,
        |      CASE WHEN vraw > 1000000000
        |        THEN list_append(list_transform(vs,
        |          x -> x * 1000000000 // vraw), CAST(1000000000 AS BIGINT))
        |        ELSE list_append(vs, vraw) END
        |    FROM (SELECT k, vs, vs[-1] * (SELECT a_e6 FROM lam)
        |            // (CAST(k + 1 AS BIGINT) * 1000000) AS vraw
        |          FROM r WHERE k < $MaxReplicas))
        |  SELECT vs FROM r WHERE k = $MaxReplicas),
        |tk AS MATERIALIZED (SELECT
        |    CAST(generate_subscripts(vs, 1) - 1 AS BIGINT) AS k,
        |    UNNEST(vs) AS t
        |  FROM lad),
        |cum AS (SELECT k, t,
        |    SUM(t) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS s_below
        |  FROM tk),
        |x AS (SELECT CAST(k AS BIGINT) AS c, t, s_below, lam.a_e6,
        |    CASE WHEN lam.a_e6 >= CAST(k AS BIGINT) * 1000000
        |      THEN 1 ELSE 0 END AS saturated
        |  FROM cum, lam WHERE k BETWEEN 1 AND $MaxReplicas),
        |y AS (SELECT *, CASE WHEN saturated = 1 THEN 0
        |    ELSE t * (c * 1000000) // (c * 1000000 - a_e6) END AS num
        |  FROM x)
        |SELECT c, CAST(a_e6 AS BIGINT) AS a_e6,
        |  CAST(a_e6 // c AS BIGINT) AS util_e6,
        |  CAST(saturated AS BIGINT) AS saturated,
        |  CAST(CASE WHEN saturated = 1 THEN 1000000
        |    ELSE CAST(num AS HUGEINT) * 1000000 // (s_below + num) END
        |    AS BIGINT) AS p_wait_e6,
        |  CAST(CASE WHEN (CASE WHEN saturated = 1 THEN 1000000
        |      ELSE CAST(num AS HUGEINT) * 1000000 // (s_below + num) END)
        |      <= 200000
        |    THEN 1 ELSE 0 END AS BIGINT) AS meets_slo
        |FROM y ORDER BY c""".stripMargin
  )
}
