package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Sequential-monitoring + corpus-diversity wave (round 12, fifth
  * wave).
  *
  * Reference intent — every query names its consumer:
  *  - q565: two-sided CUSUM (Page 1954) over deployed-forecast errors.
  *    q552's gate family covers distribution (PSI) and cumulative bias
  *    (Trigg TS); CUSUM is the SEQUENTIAL detector with bounded
  *    average-run-length — it fires on a sudden level shift the other
  *    two smear out. The recursion S_t = max(0, S_{t−1} + x_t − k) is
  *    window-expressible exactly via the prefix identity
  *    S_t = C_t − min(0, min_{j≤t} C_j) with C the running sum of
  *    (x − k) — no iterative state, one window pass per side.
  *    Consumer: the q552 retrain pipeline's third gate.
  *  - q566: Self-BLEU corpus diversity (Zhu et al. 2018 "Texygen";
  *    BLEU clipping per Papineni et al. 2002) at n = 2,3: each doc
  *    scored against all other same-language docs. The max-over-others
  *    clip needs no per-hypothesis argmax: per (lang, gram) keep
  *    (m1, #docs at m1, m2) — the clip for doc d is m2 only when d is
  *    the UNIQUE max holder, else m1. Brevity penalty omitted (scores
  *    are per-token precisions, documented). Consumer: the corpus
  *    diversity audit beside q113's gram novelty — high self-BLEU =
  *    templated corpus, the signal q23's MinHash families showed.
  *
  * House rules: exact integers, FixedLn for logarithms, clipped ≥ 1
  * shares, ordered outputs.
  */
object SequentialOpsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G510: two-sided CUSUM on deployed-forecast errors ──────────────
    // Champion = weekday-mean fit on dn ≤ max−56; monitored window =
    // the 56 days after. Allowance k = MAE_train/2, threshold
    // h = 4·MAE_train (the classic k = δ/2, h = 4σ design in MAE
    // units). All exact integers.
    "q565_cusum" -> ((s, dir) => {
      val nd = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("g"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val cut = nd.agg(expr("max(dn) - 56").as("c1"))
      val d = nd.crossJoin(broadcast(cut))
        .withColumn("dow", expr("((dn % 7) + 7) % 7"))
      val fit = d.filter(col("dn") <= col("c1"))
      val fA = fit.groupBy("g", "dow").agg(expr("sum(y) div count(1)").as("fa0"))
      val fB = fit.groupBy("g").agg(expr("sum(y) div count(1)").as("fb"))
      val trainErr = fit.join(fA, Seq("g", "dow"), "left").join(fB, Seq("g"))
        .withColumn("fa", coalesce(col("fa0"), col("fb")))
        .groupBy("g").agg(expr("sum(abs(y - fa)) div count(1)").as("mae"))
      val w = Window.partitionBy("g").orderBy("dn")
      val mon = d.filter(col("dn") > col("c1"))
        .join(fA, Seq("g", "dow"), "left").join(fB, Seq("g"))
        .withColumn("fa", coalesce(col("fa0"), col("fb")))
        .join(trainErr, Seq("g"))
        .withColumn("k", expr("mae div 2"))
        .withColumn("h", expr("4 * mae"))
        .withColumn("e", col("y") - col("fa"))
        // prefix identity: S+ = C − min(0, running-min C), C = Σ(e − k)
        .withColumn("cp", sum(expr("e - k")).over(w))
        .withColumn("cm", sum(expr("-e - k")).over(w))
        .withColumn("sp", expr("cp - least(0L, min(cp) over " +
          "(partition by g order by dn))"))
        .withColumn("sm", expr("cm - least(0L, min(cm) over " +
          "(partition by g order by dn))"))
        .withColumn("alarm", expr(
          "case when sp > h or sm > h then 1L else 0L end"))
      mon.groupBy("g")
        .agg(count(lit(1)).as("n_monitored"),
          max("k").as("k"), max("h").as("h"),
          max("sp").as("max_s_pos"), max("sm").as("max_s_neg"),
          sum("alarm").as("n_alarm_days"),
          coalesce(min(when(col("alarm") === 1L, col("dn"))), lit(-1L))
            .as("first_alarm_dn"))
        .withColumn("verdict", expr(
          "case when n_alarm_days = 0 then 'in_control' " +
            "when max_s_pos >= max_s_neg then 'shift_up' " +
            "else 'shift_down' end"))
        .orderBy("g")
    }),

    // ── G511: Self-BLEU diversity at n = 2,3 ──────────────────────────
    "q566_self_bleu" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), tokens(col("text")).as("toks"))
      def grams(n: Int): DataFrame = docs
        .filter(size(col("toks")) >= n)
        .select(col("lang"), col("doc_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), i -> " +
            (0 until n).map(j => s"element_at(toks, i + $j)")
              .mkString("concat_ws(' ', ", ", ", ")") + ")")).as("gram"))
        .groupBy("lang", "doc_id", "gram").agg(count(lit(1)).as("cnt"))
      // the per-n gram census is referenced three times downstream
      // (m1, the top-2 census, and the clip join) — land it once per
      // (JVM, dir) so those are parquet re-reads, not corpus re-scans
      // (q441/q542's lineage-checkpoint discipline; 4.3 s → ~1.5 s)
      val censusPath = PipelineQueries.cachedFixture(s"q566|$dir") { work =>
        grams(2).write.mode("overwrite").parquet(s"$work/g2")
        grams(3).write.mode("overwrite").parquet(s"$work/g3")
      }
      def precis(n: Int): DataFrame = {
        val gdf = s.read.parquet(s"$censusPath/g$n")
        // two-pass top-2 census (no per-hypothesis argmax): m1 first,
        // then nmax (#docs at m1) and m2 (runner-up) against it
        val m1df = gdf.groupBy("lang", "gram").agg(max("cnt").as("m1"))
        val agg = gdf.join(m1df, Seq("lang", "gram"))
          .groupBy("lang", "gram").agg(
            max("m1").as("m1"),
            sum(when(col("cnt") === col("m1"), 1L).otherwise(0L)).as("nmax"),
            coalesce(max(when(col("cnt") < col("m1"), col("cnt"))), lit(0L))
              .as("m2"))
        gdf.join(agg, Seq("lang", "gram"))
          .withColumn("maxref", expr(
            "case when cnt = m1 and nmax = 1 then m2 else m1 end"))
          .withColumn("clip", least(col("cnt"), col("maxref")))
          .groupBy("lang", "doc_id")
          .agg(sum("cnt").as("tot"), sum("clip").as("clipped"))
          .withColumn(s"p$n", expr("greatest(1L, clipped * 1000000 div tot)"))
          .select("lang", "doc_id", s"p$n")
      }
      val joined = precis(2).join(precis(3), Seq("lang", "doc_id"))
      // per-doc −ln of each precision (p ≤ 1e6 ⇒ ln(1e6/p) ≥ 0)
      val l2 = graft.ops.FixedLn.lnE9(
        joined.withColumn("hi", lit(1000000L)).withColumn("lo", col("p2")),
        "hi", "lo", "nl2").drop("hi", "lo")
      val l3 = graft.ops.FixedLn.lnE9(
        l2.withColumn("hi", lit(1000000L)).withColumn("lo", col("p3")),
        "hi", "lo", "nl3").drop("hi", "lo")
      l3.withColumn("nlgeo", expr("(nl2 + nl3) div 2"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(p2) div count(1)").as("mean_p2_e6"),
          expr("sum(p3) div count(1)").as("mean_p3_e6"),
          expr("sum(nlgeo) div count(1)").as("neg_log_bleu_e9"))
        .orderBy("lang")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q565_cusum" ->
      """WITH nd AS MATERIALIZED (SELECT c.c_nationkey AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
        |      AS dn,
        |    SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |cut AS (SELECT MAX(dn) - 56 AS c1 FROM nd),
        |d AS MATERIALIZED (SELECT nd.*, cut.c1, ((dn % 7) + 7) % 7 AS dow
        |  FROM nd, cut),
        |fit AS MATERIALIZED (SELECT * FROM d WHERE dn <= c1),
        |fa AS (SELECT g, dow, SUM(y) // COUNT(*) AS fa0 FROM fit
        |  GROUP BY 1, 2),
        |fb AS (SELECT g, SUM(y) // COUNT(*) AS fb FROM fit GROUP BY 1),
        |te AS (SELECT f.g, SUM(ABS(f.y - COALESCE(fa.fa0, fb.fb)))
        |      // COUNT(*) AS mae
        |  FROM fit f LEFT JOIN fa ON f.g = fa.g AND f.dow = fa.dow
        |  JOIN fb ON f.g = fb.g GROUP BY f.g),
        |mon AS MATERIALIZED (SELECT d.g, d.dn,
        |    d.y - COALESCE(fa.fa0, fb.fb) AS e,
        |    te.mae // 2 AS k, 4 * te.mae AS h
        |  FROM d LEFT JOIN fa ON d.g = fa.g AND d.dow = fa.dow
        |  JOIN fb ON d.g = fb.g JOIN te ON d.g = te.g WHERE d.dn > d.c1),
        |cs AS (SELECT g, dn, k, h,
        |    SUM(e - k) OVER (PARTITION BY g ORDER BY dn) AS cp,
        |    SUM(-e - k) OVER (PARTITION BY g ORDER BY dn) AS cm
        |  FROM mon),
        |ss AS (SELECT g, dn, k, h,
        |    cp - LEAST(0, MIN(cp) OVER (PARTITION BY g ORDER BY dn)) AS sp,
        |    cm - LEAST(0, MIN(cm) OVER (PARTITION BY g ORDER BY dn)) AS sm
        |  FROM cs),
        |al AS (SELECT *, CASE WHEN sp > h OR sm > h THEN 1 ELSE 0 END
        |    AS alarm FROM ss),
        |agg AS (SELECT g, COUNT(*) AS n_monitored, MAX(k) AS k, MAX(h) AS h,
        |    MAX(sp) AS max_s_pos, MAX(sm) AS max_s_neg,
        |    SUM(alarm) AS n_alarm_days,
        |    COALESCE(MIN(CASE WHEN alarm = 1 THEN dn END), -1)
        |      AS first_alarm_dn
        |  FROM al GROUP BY g)
        |SELECT CAST(g AS BIGINT) AS g,
        |  CAST(n_monitored AS BIGINT) AS n_monitored,
        |  CAST(k AS BIGINT) AS k, CAST(h AS BIGINT) AS h,
        |  CAST(max_s_pos AS BIGINT) AS max_s_pos,
        |  CAST(max_s_neg AS BIGINT) AS max_s_neg,
        |  CAST(n_alarm_days AS BIGINT) AS n_alarm_days,
        |  CAST(first_alarm_dn AS BIGINT) AS first_alarm_dn,
        |  CASE WHEN n_alarm_days = 0 THEN 'in_control'
        |    WHEN max_s_pos >= max_s_neg THEN 'shift_up'
        |    ELSE 'shift_down' END AS verdict
        |FROM agg ORDER BY g""".stripMargin,

    "q566_self_bleu" -> {
      def gramsSql(n: Int): String = {
        val parts = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
        s"""SELECT lang, doc_id, $parts AS gram
           |  FROM (SELECT lang, doc_id, ${sqlTokens("text")} AS toks
           |        FROM documents) d0
           |  CROSS JOIN UNNEST(range(1, len(toks) - ${n - 2})) AS t(i)
           |  WHERE len(toks) >= $n""".stripMargin
      }
      def precisSql(n: Int, pre: String): String =
        s"""${pre}g AS MATERIALIZED (SELECT lang, doc_id, gram,
           |    COUNT(*) AS cnt FROM (${gramsSql(n)}) GROUP BY 1, 2, 3),
           |${pre}t AS MATERIALIZED (SELECT ${pre}g.lang, ${pre}g.gram,
           |    MAX(m1x.m1) AS m1,
           |    SUM(CASE WHEN cnt = m1x.m1 THEN 1 ELSE 0 END) AS nmax,
           |    COALESCE(MAX(CASE WHEN cnt < m1x.m1 THEN cnt END), 0) AS m2
           |  FROM ${pre}g JOIN (SELECT lang AS l2, gram AS g2, MAX(cnt) AS m1
           |      FROM ${pre}g GROUP BY 1, 2) m1x
           |    ON ${pre}g.lang = m1x.l2 AND ${pre}g.gram = m1x.g2
           |  GROUP BY ${pre}g.lang, ${pre}g.gram),
           |${pre}p AS MATERIALIZED (SELECT g.lang, g.doc_id,
           |    GREATEST(1, SUM(LEAST(g.cnt,
           |      CASE WHEN g.cnt = t.m1 AND t.nmax = 1 THEN t.m2
           |        ELSE t.m1 END)) * 1000000 // SUM(g.cnt)) AS p$n
           |  FROM ${pre}g g JOIN ${pre}t t
           |    ON g.lang = t.lang AND g.gram = t.gram
           |  GROUP BY g.lang, g.doc_id)""".stripMargin
      s"""WITH ${precisSql(2, "b2")},
        |${precisSql(3, "b3")},
        |j AS (SELECT b2p.lang, b2p.doc_id, b2p.p2, b3p.p3
        |  FROM b2p JOIN b3p ON b2p.lang = b3p.lang
        |    AND b2p.doc_id = b3p.doc_id),
        |c1 AS (SELECT *, CAST(1000000 AS BIGINT) AS hi, p2 AS lo FROM j),
        |${graft.ops.FixedLn.sqlLnE9Stages("c1", "hi", "lo", "nl2", "la")},
        |mid AS (SELECT lang, doc_id, p2, p3, nl2 FROM la12),
        |c2 AS (SELECT *, CAST(1000000 AS BIGINT) AS hi, p3 AS lo FROM mid),
        |${graft.ops.FixedLn.sqlLnE9Stages("c2", "hi", "lo", "nl3", "lb")},
        |f AS (SELECT lang, p2, p3, (nl2 + nl3) // 2 AS nlgeo FROM lb12)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(p2) // COUNT(*) AS BIGINT) AS mean_p2_e6,
        |  CAST(SUM(p3) // COUNT(*) AS BIGINT) AS mean_p3_e6,
        |  CAST(SUM(nlgeo) // COUNT(*) AS BIGINT) AS neg_log_bleu_e9
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}
