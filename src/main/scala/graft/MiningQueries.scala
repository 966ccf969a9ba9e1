package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mining-and-fitting subsystem (round 10, forty-eighth wave): binary
  * sign-sketch Hamming recall over embeddings, two-factor exact OLS by
  * Cramer's rule, a confident-learning label-noise screen, and Apriori
  * 3-itemset mining with its monotonicity certificate.
  *
  * Reference intent: the reference's model line stops at one-regressor
  * trends and raw labels (services/training-service/app/train_utils
  * .py:24-35). These four land the next rung on each ladder: the sign
  * sketch is the 60× cheaper Hamming prefilter a vector store runs
  * before exact scoring (and the audit MEASURES what that compression
  * costs in recall); Cramer lifts the house exact-OLS from one
  * regressor to the trend+weekend design matrix (3×3 determinants in
  * DECIMAL(38,0) — the normal-equation route that needs no iterative
  * solver); the label-noise screen turns q235's confusion matrix into
  * the per-row margin test confident learning prunes by; and Apriori
  * extends q198's pair mining to triples with the frequent-item prune
  * applied BEFORE any self-join — the only order that scales.
  */
object MiningQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G310: binary sign-sketch + Hamming recall audit ────────────────
    // Each embedding's first 60 dims collapse to one BIGINT of sign
    // bits (60, not 64 — packing 64 would wrap the sign bit under ANSI
    // overflow). For 10 hash-picked probes: Hamming top-5
    // (bit_count(xor)) vs exact top-5 by integer L2² on e3-quantized
    // coordinates (q245's discipline); recall@5 = overlap. The sketch
    // join ships ONE long per vector instead of 64 floats — the audit
    // prices that 25× transport cut in recall points. Probe-bounded:
    // 10 × |V| comparisons, never |V|².
    "q365_sign_sketch_recall" -> ((s, dir) => {
      // spread: the sign-pack folds + the probe nested-loop pairing
      // otherwise run inside the single-row-group scan's one task
      val packed = graft.ops.Relational.spread(Tables.embeddings(s, dir)).select(
        col("vec_id"),
        expr("aggregate(transform(slice(embedding, 1, 60), " +
          "x -> case when x > cast(0 as float) then 1L else 0L end), 0L, (a, x) -> a * 2 + x)")
          .as("sk"),
        expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("q"))
      val probes = packed
        .filter(expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 4), 16, 10) as bigint) % 50 = 0"))
        .select(col("vec_id").as("p_id"), col("sk").as("p_sk"), col("q").as("p_q"))
      val pairs = probes.crossJoin(packed).filter(col("vec_id") =!= col("p_id"))
        .withColumn("ham", expr("bit_count(p_sk ^ sk)"))
        .withColumn("l2", expr(
          "aggregate(zip_with(p_q, q, (a, b) -> (a - b) * (a - b)), 0L, (a, x) -> a + x)"))
      val wH = org.apache.spark.sql.expressions.Window
        .partitionBy("p_id").orderBy(col("ham").asc, col("vec_id").asc)
      val wL = org.apache.spark.sql.expressions.Window
        .partitionBy("p_id").orderBy(col("l2").asc, col("vec_id").asc)
      val ranked = pairs
        .withColumn("rh", row_number().over(wH))
        .withColumn("rl", row_number().over(wL))
      ranked.filter(col("rh") <= 5 || col("rl") <= 5)
        .groupBy("p_id")
        .agg(sum(when(col("rh") <= 5 && col("rl") <= 5, 1L).otherwise(0L)).as("n_overlap"),
          min(when(col("rl") <= 5, col("ham"))).as("best_true_ham"))
        .withColumn("recall_e4", expr("n_overlap * 10000 div 5"))
        .orderBy("p_id")
    }),

    // ── G311: two-factor exact OLS (trend + weekend) via Cramer 3×3 ────
    // y = β₀ + β₁·t + β₂·weekend on daily revenue: the normal equations
    // solve by Cramer's rule with all four 3×3 determinants expanded in
    // DECIMAL(38,0) (largest product ~Σty·Σt²·n ≈ 1e28 at sf1 — safely
    // inside 38 digits; HUGEINT mirror). β_e6 = det_i·10⁶ div det(A).
    // One moment aggregate over the dense day spine feeds everything;
    // the in-sample integer MAE of the fitted plane rides along so the
    // two-factor fit is comparable against q31/q236's one-factor runs.
    "q366_cramer_ols" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .groupBy(expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      val base = d.crossJoin(broadcast(d.agg(min("dn").as("d0"))))
        .withColumn("t", col("dn") - col("d0"))
        .withColumn("wk", expr("case when ((dn % 7) + 7) % 7 >= 5 then 1L else 0L end"))
      val m = base.agg(count(lit(1)).as("n"), sum("t").as("st"), sum("wk").as("sw"),
        sum(expr("t * t")).as("stt"), sum(expr("t * wk")).as("stw"),
        sum(expr("wk * wk")).as("sww"), sum("y").as("sy"),
        sum(expr("t * y")).as("sty"), sum(expr("wk * y")).as("swy"))
      val det = (a1: String, a2: String, a3: String,
                 b1: String, b2: String, b3: String,
                 c1: String, c2: String, c3: String) =>
        s"(cast($a1 as decimal(38,0)) * (cast($b2 as decimal(38,0)) * $c3 - cast($b3 as decimal(38,0)) * $c2)" +
          s" - cast($a2 as decimal(38,0)) * (cast($b1 as decimal(38,0)) * $c3 - cast($b3 as decimal(38,0)) * $c1)" +
          s" + cast($a3 as decimal(38,0)) * (cast($b1 as decimal(38,0)) * $c2 - cast($b2 as decimal(38,0)) * $c1))"
      val fitted = m
        .withColumn("da", expr(det("n", "st", "sw", "st", "stt", "stw", "sw", "stw", "sww")))
        .withColumn("d0d", expr(det("sy", "st", "sw", "sty", "stt", "stw", "swy", "stw", "sww")))
        .withColumn("d1d", expr(det("n", "sy", "sw", "st", "sty", "stw", "sw", "swy", "sww")))
        .withColumn("d2d", expr(det("n", "st", "sy", "st", "stt", "sty", "sw", "stw", "swy")))
        .withColumn("b0_e6", expr("cast(d0d * 1000000 div da as bigint)"))
        .withColumn("b1_e6", expr("cast(d1d * 1000000 div da as bigint)"))
        .withColumn("b2_e6", expr("cast(d2d * 1000000 div da as bigint)"))
        .select("n", "b0_e6", "b1_e6", "b2_e6")
      base.crossJoin(broadcast(fitted))
        .withColumn("fit", expr("(b0_e6 + b1_e6 * t + b2_e6 * wk) div 1000000"))
        .agg(max("n").as("n_days"), max("b0_e6").as("b0_e6"),
          max("b1_e6").as("b1_e6"), max("b2_e6").as("b2_e6"),
          expr("sum(abs(y - fit)) div count(1)").as("mae_c"))
    }),

    // ── G312: confident-learning label-noise screen ────────────────────
    // Nearest-centroid predicted labels (integer L2² on e3-quantized
    // coordinates, centroids as floor-div means — q235's machinery)
    // feed the per-row MARGIN test: a row is a noise CANDIDATE when its
    // given-label centroid is at least 2× as far as its predicted
    // centroid (d_given·10 ≥ d_pred·20). Census per given label: rows,
    // candidates, and the label they most confuse into (deterministic
    // argmax) — the cleaning worklist confident learning hands a
    // labeling team. |V|·|classes| comparisons, centroids broadcast.
    "q367_label_noise_screen" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("q"))
      val cent = v.select(col("label").as("cl"), explode(expr(
          "transform(q, (x, i) -> struct(i as i, x as x))")).as("e"))
        .groupBy("cl", "e.i").agg(expr("sum(e.x) div count(1)").as("c"))
        .groupBy("cl").agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)").as("cq"))
      val dists = v.crossJoin(broadcast(cent))
        .withColumn("d2", expr(
          "aggregate(zip_with(q, cq, (a, b) -> (a - b) * (a - b)), 0L, (a, x) -> a + x)"))
      val best = dists
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("d2").asc, col("cl").asc)))
      val pred = best.filter(col("rk") === 1)
        .select(col("vec_id").as("pv"), col("cl").as("pred"), col("d2").as("d_pred"))
      val given = dists.filter(col("label") === col("cl"))
        .select(col("vec_id").as("gv"), col("label").as("given"), col("d2").as("d_given"))
      val rows = pred.join(given, col("pv") === col("gv"))
        .withColumn("candidate", col("pred") =!= col("given") &&
          expr("d_given * 10 >= d_pred * 20"))
      val conf = rows.filter(col("candidate"))
        .groupBy("given", "pred").agg(count(lit(1)).as("np"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("given").orderBy(col("np").desc, col("pred").asc)))
        .filter(col("rk") === 1)
        .select(col("given").as("g2"), col("pred").as("top_confused_into"))
      rows.groupBy(col("given").cast(LongType).as("given"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("candidate"), 1L).otherwise(0L)).as("n_candidates"))
        .join(conf.select(col("g2").cast(LongType).as("given"),
          col("top_confused_into").cast(LongType).as("top_confused_into")), Seq("given"), "left")
        .withColumn("top_confused_into", coalesce(col("top_confused_into"), lit(-1L)))
        .withColumn("cand_share_e4", expr("n_candidates * 10000 div n_rows"))
        .orderBy("given")
    }),

    // ── G313: Apriori 3-itemset mining + monotonicity certificate ──────
    // Frequent triples of parts bought together: frequent-1 items
    // (support ≥ 5 baskets) prune the basket rows FIRST — the only
    // order that scales, since the triple self-join then runs on the
    // pruned, frequent-only rows. Top-20 triples by support with the
    // supports of all three constituent PAIRS alongside: Apriori's
    // monotonicity (any subset of a frequent set is at least as
    // frequent) becomes a per-row certificate the spec asserts.
    "q368_apriori_triples" -> ((s, dir) => {
      // localCheckpoints (guide §3.3): the basket rows are read by the
      // support count + three self-join arms, and the x–y pair join is
      // shared verbatim by the pair supports AND the triple enumeration
      // — lazily each was recomputed per branch (the x–y join twice)
      val rows = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("p")).distinct()
        .localCheckpoint()
      val freq1 = rows.groupBy("p").agg(count(lit(1)).as("s1")).filter(col("s1") >= 5)
      val fr = rows.join(broadcast(freq1.select("p")), Seq("p")).localCheckpoint()
      val xy = fr.as("x").join(fr.as("y"),
          col("x.b") === col("y.b") && col("x.p") < col("y.p"))
        .select(col("x.b").as("xyb"), col("x.p").as("pa"), col("y.p").as("pb"))
        .localCheckpoint()
      // Optimization r15 measured-and-reverted: checkpointing `pairs`
      // (3 join arms below) measured SLOWER (3.16→3.72 s at sf0.1) —
      // the three re-aggregations of checkpointed xy blocks run
      // concurrently inside the one action, while an eager pairs
      // materialization is a serial job barrier.
      val pairs = xy
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("s2"))
      val triples = xy
        .join(fr.as("z"), col("xyb") === col("z.b") && col("pb") < col("z.p"))
        .groupBy(col("pa"), col("pb"), col("z.p").as("pc"))
        .agg(count(lit(1)).as("s3"))
        .orderBy(col("s3").desc, col("pa").asc, col("pb").asc, col("pc").asc)
        .limit(20)
      triples
        .join(pairs.select(col("pa").as("j1a"), col("pb").as("j1b"), col("s2").as("s_ab")),
          col("pa") === col("j1a") && col("pb") === col("j1b"))
        .join(pairs.select(col("pa").as("j2a"), col("pb").as("j2c"), col("s2").as("s_ac")),
          col("pa") === col("j2a") && col("pc") === col("j2c"))
        .join(pairs.select(col("pa").as("j3b"), col("pb").as("j3c"), col("s2").as("s_bc")),
          col("pb") === col("j3b") && col("pc") === col("j3c"))
        .select("pa", "pb", "pc", "s3", "s_ab", "s_ac", "s_bc")
        .orderBy(col("s3").desc, col("pa").asc, col("pb").asc, col("pc").asc)
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q365_sign_sketch_recall" ->
      """WITH packed AS (SELECT vec_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(embedding[1:60],
        |        x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT))),
        |      (a, x) -> a * 2 + x) AS sk,
        |    list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |probes AS (SELECT vec_id AS p_id, sk AS p_sk, q AS p_q FROM packed
        |           WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) AS BIGINT) % 50 = 0),
        |pairs AS (SELECT p_id, vec_id,
        |            bit_count(xor(p_sk, sk)) AS ham,
        |            list_sum(list_transform(range(1, 65),
        |              i -> (p_q[i] - q[i]) * (p_q[i] - q[i]))) AS l2
        |          FROM probes CROSS JOIN packed WHERE vec_id != p_id),
        |ranked AS (SELECT *,
        |             ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY ham, vec_id) AS rh,
        |             ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY l2, vec_id) AS rl
        |           FROM pairs)
        |SELECT CAST(p_id AS BIGINT) AS p_id,
        |       CAST(SUM(CASE WHEN rh <= 5 AND rl <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |       CAST(MIN(CASE WHEN rl <= 5 THEN ham END) AS BIGINT) AS best_true_ham,
        |       CAST(SUM(CASE WHEN rh <= 5 AND rl <= 5 THEN 1 ELSE 0 END) * 10000 // 5 AS BIGINT) AS recall_e4
        |FROM ranked WHERE rh <= 5 OR rl <= 5
        |GROUP BY p_id ORDER BY p_id""".stripMargin,

    "q366_cramer_ols" ->
      """WITH d AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn,
        |             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        |           FROM orders GROUP BY 1),
        |d0 AS (SELECT MIN(dn) AS d0 FROM d),
        |base AS (SELECT dn, y, dn - d0 AS t,
        |           CASE WHEN ((dn % 7) + 7) % 7 >= 5 THEN 1 ELSE 0 END AS wk
        |         FROM d, d0),
        |m AS (SELECT COUNT(*) AS n, SUM(t) AS st, SUM(wk) AS sw,
        |        SUM(t * t) AS stt, SUM(t * wk) AS stw, SUM(wk * wk) AS sww,
        |        SUM(y) AS sy, SUM(t * y) AS sty, SUM(wk * y) AS swy
        |      FROM base),
        |dets AS (SELECT *,
        |    (CAST(n AS HUGEINT) * (CAST(stt AS HUGEINT) * sww - CAST(stw AS HUGEINT) * stw)
        |     - CAST(st AS HUGEINT) * (CAST(st AS HUGEINT) * sww - CAST(stw AS HUGEINT) * sw)
        |     + CAST(sw AS HUGEINT) * (CAST(st AS HUGEINT) * stw - CAST(stt AS HUGEINT) * sw)) AS da,
        |    (CAST(sy AS HUGEINT) * (CAST(stt AS HUGEINT) * sww - CAST(stw AS HUGEINT) * stw)
        |     - CAST(st AS HUGEINT) * (CAST(sty AS HUGEINT) * sww - CAST(stw AS HUGEINT) * swy)
        |     + CAST(sw AS HUGEINT) * (CAST(sty AS HUGEINT) * stw - CAST(stt AS HUGEINT) * swy)) AS d0d,
        |    (CAST(n AS HUGEINT) * (CAST(sty AS HUGEINT) * sww - CAST(stw AS HUGEINT) * swy)
        |     - CAST(sy AS HUGEINT) * (CAST(st AS HUGEINT) * sww - CAST(stw AS HUGEINT) * sw)
        |     + CAST(sw AS HUGEINT) * (CAST(st AS HUGEINT) * swy - CAST(sty AS HUGEINT) * sw)) AS d1d,
        |    (CAST(n AS HUGEINT) * (CAST(stt AS HUGEINT) * swy - CAST(sty AS HUGEINT) * stw)
        |     - CAST(st AS HUGEINT) * (CAST(st AS HUGEINT) * swy - CAST(sty AS HUGEINT) * sw)
        |     + CAST(sy AS HUGEINT) * (CAST(st AS HUGEINT) * stw - CAST(stt AS HUGEINT) * sw)) AS d2d
        |  FROM m),
        |fit AS (SELECT n, CAST(d0d * 1000000 // da AS BIGINT) AS b0_e6,
        |          CAST(d1d * 1000000 // da AS BIGINT) AS b1_e6,
        |          CAST(d2d * 1000000 // da AS BIGINT) AS b2_e6
        |        FROM dets)
        |SELECT CAST(MAX(fit.n) AS BIGINT) AS n_days,
        |       CAST(MAX(b0_e6) AS BIGINT) AS b0_e6,
        |       CAST(MAX(b1_e6) AS BIGINT) AS b1_e6,
        |       CAST(MAX(b2_e6) AS BIGINT) AS b2_e6,
        |       CAST(SUM(ABS(y - (b0_e6 + b1_e6 * t + b2_e6 * wk) // 1000000))
        |         // COUNT(*) AS BIGINT) AS mae_c
        |FROM base, fit""".stripMargin,

    "q367_label_noise_screen" ->
      """WITH v AS (SELECT vec_id, label,
        |             list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q
        |           FROM embeddings),
        |ex AS (SELECT label AS cl, i, q[i] AS x
        |       FROM v, UNNEST(range(1, 65)) AS t(i)),
        |cm AS (SELECT cl, i, SUM(x) // COUNT(*) AS c FROM ex GROUP BY cl, i),
        |cent AS (SELECT cl, list(c ORDER BY i) AS cq FROM cm GROUP BY cl),
        |dists AS (SELECT vec_id, label, cl,
        |            list_sum(list_transform(range(1, 65),
        |              i -> (q[i] - cq[i]) * (q[i] - cq[i]))) AS d2
        |          FROM v CROSS JOIN cent),
        |best AS (SELECT vec_id AS pv, cl AS pred, d2 AS d_pred FROM
        |           (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rk
        |            FROM dists) z WHERE rk = 1),
        |giv AS (SELECT vec_id AS gv, label AS given, d2 AS d_given
        |        FROM dists WHERE label = cl),
        |rws AS (SELECT *, pred != given AND d_given * 10 >= d_pred * 20 AS candidate
        |        FROM best JOIN giv ON pv = gv),
        |conf AS (SELECT given AS g2, pred AS top_confused_into FROM
        |           (SELECT given, pred, COUNT(*) AS np,
        |              ROW_NUMBER() OVER (PARTITION BY given ORDER BY COUNT(*) DESC, pred) AS rk
        |            FROM rws WHERE candidate GROUP BY given, pred) z
        |         WHERE rk = 1)
        |SELECT CAST(given AS BIGINT) AS given,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CASE WHEN candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
        |       CAST(COALESCE(MAX(top_confused_into), -1) AS BIGINT) AS top_confused_into,
        |       CAST(SUM(CASE WHEN candidate THEN 1 ELSE 0 END) * 10000
        |         // COUNT(*) AS BIGINT) AS cand_share_e4
        |FROM rws LEFT JOIN conf ON given = g2
        |GROUP BY given ORDER BY given""".stripMargin,

    "q368_apriori_triples" ->
      """WITH rows0 AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS p FROM lineitem),
        |freq1 AS (SELECT p FROM rows0 GROUP BY p HAVING COUNT(*) >= 5),
        |fr AS (SELECT rows0.b, rows0.p FROM rows0 JOIN freq1 USING (p)),
        |pairs AS (SELECT x.p AS pa, y.p AS pb, COUNT(*) AS s2
        |          FROM fr x JOIN fr y ON x.b = y.b AND x.p < y.p
        |          GROUP BY x.p, y.p),
        |triples AS (SELECT x.p AS pa, y.p AS pb, z.p AS pc, COUNT(*) AS s3
        |            FROM fr x JOIN fr y ON x.b = y.b AND x.p < y.p
        |              JOIN fr z ON y.b = z.b AND y.p < z.p
        |            GROUP BY x.p, y.p, z.p
        |            ORDER BY s3 DESC, pa, pb, pc LIMIT 20)
        |SELECT CAST(t.pa AS BIGINT) AS pa, CAST(t.pb AS BIGINT) AS pb,
        |       CAST(t.pc AS BIGINT) AS pc, CAST(s3 AS BIGINT) AS s3,
        |       CAST(ab.s2 AS BIGINT) AS s_ab, CAST(ac.s2 AS BIGINT) AS s_ac,
        |       CAST(bc.s2 AS BIGINT) AS s_bc
        |FROM triples t
        |  JOIN pairs ab ON t.pa = ab.pa AND t.pb = ab.pb
        |  JOIN pairs ac ON t.pa = ac.pa AND t.pc = ac.pb
        |  JOIN pairs bc ON t.pb = bc.pa AND t.pc = bc.pb
        |ORDER BY s3 DESC, pa, pb, pc""".stripMargin
  )
}
