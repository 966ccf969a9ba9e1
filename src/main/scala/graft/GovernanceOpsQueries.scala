package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Governance/eval-ops wave (round 11): the privacy-release test, the
  * incomplete-judgment retrieval metric, and the popularity-bias audit.
  *
  * Reference intent — every query names its consumer (r10 verdict
  * "next" #4):
  *  - q549: t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) —
  *    the release test k-anonymity (q140) and l-diversity (q231)
  *    famously miss: an equivalence class may be large and diverse yet
  *    still leak because its SENSITIVE DISTRIBUTION differs from the
  *    table's. For the ordered sensitive attribute (order priority,
  *    '1-URGENT'..'5-LOW' — digit prefix makes string order the
  *    semantic order) the distance is the ordered EMD = mean absolute
  *    prefix-share gap, exact at e6 from cumulative counts (five
  *    conditional sums — no windows at all). Consumer: the privacy
  *    office's release gate, completing the q140/q231 family.
  *  - q550: bpref (Buckley & Voorhees, SIGIR 2004) — the retrieval
  *    metric built for INCOMPLETE qrels: only judged docs count, so
  *    unjudged ones (the common case when pooling) neither reward nor
  *    punish. Judged = a deterministic md5 half of the pool; bpref =
  *    (1/R)·Σ_rel (1 − min(#nonrel-above, R)/min(R, N)), exact e6.
  *    Consumer: the ranking-eval family (q276 nDCG, q538 ERR) when
  *    the judgment pool is partial — the realistic eval regime.
  *  - q551: recommendation novelty (Vargas & Castells, RecSys 2011):
  *    self-information −ln(popularity) of the items each ranking arm
  *    surfaces — support-ranked top-20 co-purchase pairs vs q198's
  *    lift-ranked top-20 — via the shared graft.ops.FixedLn kernel
  *    (FIFTH consumer). The classic result made measurable: support
  *    ranking surfaces head items (low novelty), lift ranking the
  *    tail. Consumer: the q198/q207/q377 recommender family's
  *    diversity scoreboard.
  *
  * House rules: exact integers, floor div, per-key windows only,
  * ordered outputs; ln only through ops/FixedLn.
  */
object GovernanceOpsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G494: t-closeness release audit (ordered EMD) ──────────────────
    "q549_t_closeness" -> ((s, dir) => {
      val od = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nat"),
          expr("substring(cast(o_orderdate as string), 1, 7)").as("month"),
          expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("pr"))
      def cums(df: DataFrame, keys: Seq[String]): DataFrame = {
        val aggs = (1 to 4).map(k =>
          sum(when(col("pr") <= k, 1L).otherwise(0L)).as(s"c$k")) :+
          count(lit(1)).as("n")
        df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
      val cls = cums(od, Seq("nat", "month"))
      val glob = cums(od.withColumn("all", lit(1)), Seq("all"))
        .select((1 to 4).map(k => col(s"c$k").as(s"g$k")) :+ col("n").as("gn"): _*)
      val emd = cls.crossJoin(broadcast(glob))
        .withColumn("emd_e6", expr((1 to 4).map(k =>
          s"abs(c$k * 1000000 div n - g$k * 1000000 div gn)")
          .mkString("(", " + ", ") div 4")))
      emd.groupBy("nat")
        .agg(count(lit(1)).as("n_classes"),
          min("n").as("min_class_rows"),
          max("emd_e6").as("max_emd_e6"),
          sum(when(col("emd_e6") > 150000L, 1L).otherwise(0L)).as("n_over_t"),
          min_by(col("month"), struct(negate(col("emd_e6")), col("month")))
            .as("worst_month"))
        .orderBy("nat")
    }),

    // ── G495: bpref under incomplete judgments ─────────────────────────
    "q550_bpref" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qe"))
      val judged = e.filter(col("vec_id") >= 8)
        .crossJoin(broadcast(qs))
        .withColumn("jud", expr(
          "cast(conv(substring(md5(concat('j:', cast(vec_id as string))), " +
            "1, 8), 16, 10) as bigint) % 2"))
        .filter(col("jud") === 0L)
        .select(col("qid"), col("vec_id"),
          when(col("label") === col("qlabel"), 1L).otherwise(0L).as("rel"),
          graft.functions.VectorFunctions.cosineR6(col("v"), col("qe"))
            .as("cos_r"))
      val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("vec_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cw = Window.partitionBy("qid")
      val t = judged
        .withColumn("na", count(when(col("rel") === 0L, 1)).over(w))
        .withColumn("rr", sum("rel").over(cw))
        .withColumn("nn", sum(expr("1 - rel")).over(cw))
      // nn = 0 guard (ADVICE r11): a qid whose judged pool has zero
      // non-relevant docs must score bpref = 1.0, not NULL — na is 0
      // there, so clamping the divisor to 1 yields exactly 1000000
      t.filter(col("rel") === 1L)
        .withColumn("term_e6", expr(
          "1000000 - least(na, rr) * 1000000 div greatest(least(rr, nn), 1L)"))
        .groupBy("qid")
        .agg(max("rr").as("r_judged"), max("nn").as("n_judged_nonrel"),
          expr("sum(term_e6) div max(rr)").as("bpref_e6"))
        .orderBy("qid")
    }),

    // ── G496: recommendation novelty (popularity self-information) ─────
    "q551_rec_novelty" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val (items, co) = LakeQueries.basketTables(s, dir)
      val nOrders = items.select("okey").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val pf = items.groupBy("pk").agg(count(lit(1)).as("pn"))
      // min-support 2 (not q198's 5): the lift arm must stay
      // populated at every declared check scale (max co = 3 at sf0.1)
      val byLift = co.filter(col("co") >= 2)
        .join(pf.select(col("pk").as("pa"), col("pn").as("na")), Seq("pa"))
        .join(pf.select(col("pk").as("pb"), col("pn").as("nb")), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .withColumn("lift_e4", expr(
          s"cast((cast(co as $dec) * n_orders * 10000) div " +
            s"(cast(na as $dec) * nb) as bigint)"))
        .orderBy(col("lift_e4").desc, col("pa"), col("pb")).limit(20)
        .select(col("pa"), col("pb"), lit("lift").as("arm"))
      val bySupport = co
        .orderBy(col("co").desc, col("pa"), col("pb")).limit(20)
        .select(col("pa"), col("pb"), lit("support").as("arm"))
      val rec = byLift.unionByName(bySupport)
        .select(col("arm"), explode(array(col("pa"), col("pb"))).as("pk"))
        .distinct()
      val nov0 = rec.join(pf, Seq("pk")).crossJoin(broadcast(nOrders))
        .withColumn("pop_e6", expr(
          "greatest(1L, pn * 1000000 div n_orders)"))
        .withColumn("hi", lit(1000000L)).withColumn("lo", col("pop_e6"))
      graft.ops.FixedLn.lnE9(nov0, "hi", "lo", "nov_e9")
        .groupBy("arm")
        .agg(count(lit(1)).as("n_items"),
          expr("sum(nov_e9) div count(1)").as("mean_nov_e9"),
          min("nov_e9").as("min_nov_e9"), max("nov_e9").as("max_nov_e9"))
        .orderBy("arm")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q549_t_closeness" -> {
      val cs = (1 to 4).map(k =>
        s"SUM(CASE WHEN pr <= $k THEN 1 ELSE 0 END) AS c$k").mkString(", ")
      s"""WITH od AS MATERIALIZED (SELECT c.c_nationkey AS nat,
         |    substr(CAST(o.o_orderdate AS VARCHAR), 1, 7) AS month,
         |    CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS pr
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |cls AS (SELECT nat, month, $cs, COUNT(*) AS n FROM od
         |  GROUP BY 1, 2),
         |gl AS (SELECT $cs, COUNT(*) AS gn FROM od),
         |emd AS (SELECT cls.nat, cls.month, cls.n,
         |    (${(1 to 4).map(k =>
              s"ABS(cls.c$k * 1000000 // cls.n - gl.c$k * 1000000 // gl.gn)")
              .mkString(" + ")}) // 4 AS emd_e6
         |  FROM cls, gl),
         |wm AS (SELECT nat, month AS worst_month FROM
         |  (SELECT nat, month, ROW_NUMBER() OVER (PARTITION BY nat
         |     ORDER BY emd_e6 DESC, month) AS rn FROM emd) WHERE rn = 1)
         |SELECT CAST(e.nat AS BIGINT) AS nat,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(MIN(n) AS BIGINT) AS min_class_rows,
         |  CAST(MAX(emd_e6) AS BIGINT) AS max_emd_e6,
         |  CAST(SUM(CASE WHEN emd_e6 > 150000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_over_t,
         |  MAX(wm.worst_month) AS worst_month
         |FROM emd e JOIN wm ON e.nat = wm.nat
         |GROUP BY e.nat ORDER BY e.nat""".stripMargin
    },

    "q550_bpref" -> {
      val cos = graft.functions.VectorFunctions.sqlCosineR6("v", "qe")
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qs AS (SELECT vec_id AS qid, label AS qlabel, v AS qe FROM e
         |  WHERE vec_id < 8),
         |judged AS MATERIALIZED (SELECT qid,
         |    e.vec_id,
         |    CASE WHEN e.label = qlabel THEN 1 ELSE 0 END AS rel,
         |    $cos AS cos_r
         |  FROM e CROSS JOIN qs
         |  WHERE e.vec_id >= 8 AND CAST('0x' || substr(md5('j:' ||
         |    CAST(e.vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0),
         |t AS (SELECT *,
         |    COUNT(CASE WHEN rel = 0 THEN 1 END) OVER (PARTITION BY qid
         |      ORDER BY cos_r DESC, vec_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS na,
         |    SUM(rel) OVER (PARTITION BY qid) AS rr,
         |    SUM(1 - rel) OVER (PARTITION BY qid) AS nn
         |  FROM judged)
         |SELECT CAST(qid AS BIGINT) AS qid,
         |  CAST(MAX(rr) AS BIGINT) AS r_judged,
         |  CAST(MAX(nn) AS BIGINT) AS n_judged_nonrel,
         |  CAST(SUM(1000000 - LEAST(na, rr) * 1000000
         |      // GREATEST(LEAST(rr, nn), 1))
         |    // MAX(rr) AS BIGINT) AS bpref_e6
         |FROM t WHERE rel = 1 GROUP BY qid ORDER BY qid""".stripMargin
    },

    "q551_rec_novelty" ->
      s"""WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey,
         |    l_partkey AS pk FROM lineitem),
         |co AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS co
         |  FROM items a JOIN items b ON a.okey = b.okey AND a.pk < b.pk
         |  GROUP BY 1, 2),
         |no AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
         |pf AS MATERIALIZED (SELECT pk, COUNT(*) AS pn FROM items
         |  GROUP BY pk),
         |lifted AS (SELECT co.pa, co.pb, 'lift' AS arm FROM co
         |  JOIN pf na ON na.pk = co.pa JOIN pf nb ON nb.pk = co.pb, no
         |  WHERE co.co >= 2
         |  ORDER BY (CAST(co.co AS HUGEINT) * no.n_orders * 10000)
         |    // (CAST(na.pn AS HUGEINT) * nb.pn) DESC, co.pa, co.pb
         |  LIMIT 20),
         |supported AS (SELECT pa, pb, 'support' AS arm FROM co
         |  ORDER BY co DESC, pa, pb LIMIT 20),
         |rec AS (SELECT DISTINCT arm, pk FROM (
         |  SELECT arm, UNNEST([pa, pb]) AS pk FROM
         |    (SELECT * FROM lifted UNION ALL SELECT * FROM supported))),
         |nov0 AS (SELECT rec.arm,
         |    CAST(1000000 AS BIGINT) AS hi,
         |    CAST(GREATEST(1, pf.pn * 1000000 // no.n_orders) AS BIGINT)
         |      AS lo
         |  FROM rec JOIN pf ON rec.pk = pf.pk, no),
         |${graft.ops.FixedLn.sqlLnE9Stages("nov0", "hi", "lo", "nov_e9", "lx")}
         |SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(nov_e9) // COUNT(*) AS BIGINT) AS mean_nov_e9,
         |  CAST(MIN(nov_e9) AS BIGINT) AS min_nov_e9,
         |  CAST(MAX(nov_e9) AS BIGINT) AS max_nov_e9
         |FROM lx12 GROUP BY arm ORDER BY arm""".stripMargin
  )
}
