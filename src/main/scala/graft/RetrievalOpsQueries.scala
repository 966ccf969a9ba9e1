package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.boundedGlobalRank

/** Retrieval/mixture-operations wave (round 11, third wave): the IVF
  * nprobe tuning curve, mixture-temperature economics, and dup-cluster
  * purity.
  *
  * Reference intent — consumers (r10 verdict "next" #4):
  *  - q531: q38 ships the IVF index probing ONE cell; the knob every
  *    IVF deployment tunes is nprobe — recall rises with probed cells,
  *    cost rises with candidates touched. This emits the measured
  *    curve for nprobe ∈ {1,2,4,8} against the exact top-10, with the
  *    candidate share as the cost axis. Consumer: q38's index
  *    configuration (and q69's recall audit, which graded only the
  *    shipped point).
  *  - q532: q89 samples the corpus by per-source weights; pretraining
  *    mixtures choose between uniform, √-damped, and proportional
  *    weighting (the temperature knob). Exact-integer weights (isqrt
  *    by guarded floor), per-policy over/under-sampling economics:
  *    how many epochs of its own data the most over-sampled source
  *    effectively sees. Consumer: the q89 mixture before a training
  *    run commits to it.
  *  - q533: q79 deletes non-canonical dup-cluster members and q90
  *    audits pairwise source overlap; the cluster-grain risk is
  *    CROSS-SOURCE clusters — canonical selection silently deletes
  *    another source's documents. Purity census over the landed
  *    component table. Consumer: the q87 pipeline's deletion step.
  */
object RetrievalOpsQueries {

  private val Probes = Seq(1, 2, 4, 8)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G476: IVF nprobe sweep (recall vs candidates touched) ──────────
    "q531_ivf_nprobe_sweep" -> ((s, dir) => {
      import graft.functions.VectorFunctions.{asDouble, cosineR6}
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val seeds = e.filter(col("vec_id").between(1, 8))
        .select(col("vec_id").as("seed_id"), col("v").as("sv"))
      // q38's exact cell assignment (max cosine, seed_id tiebreak)
      val cells = e.crossJoin(broadcast(seeds))
        .select(col("vec_id"), col("v"), col("seed_id"),
          cosineR6(col("v"), col("sv")).as("seed_cos"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("seed_id"), col("v")),
          struct(col("seed_cos"), negate(col("seed_id")))).as("w"))
        .select(col("vec_id"), col("w.v").as("v"), col("w.seed_id").as("cell"))
      val qv = e.filter(col("vec_id") === 0).select(col("v").as("qe"))
      // cells ranked by query affinity — 8 rows, rank attached post-limit
      val cellRank = seeds.crossJoin(broadcast(qv))
        .select(col("seed_id").as("cell"), cosineR6(col("sv"), col("qe")).as("qcos"))
        .orderBy(col("qcos").desc, col("cell").asc).limit(8)
        .withColumn("crk", row_number().over(
          boundedGlobalRank(col("qcos").desc, col("cell").asc)))
        .select("cell", "crk")
      val probes = s.createDataFrame(Probes.map(Tuple1(_))).toDF("nprobe")
        .crossJoin(cellRank).filter(col("crk") <= col("nprobe"))
        .select(col("nprobe").cast("long").as("nprobe"), col("cell"))
      val nCorpus = e.filter(col("vec_id") =!= 0).count()
      val cand = cells.filter(col("vec_id") =!= 0)
        .join(broadcast(probes), "cell")
      val scored = cand.crossJoin(broadcast(qv))
        .select(col("nprobe"), col("vec_id"), cosineR6(col("v"), col("qe")).as("cos_r"))
      val top10 = scored.withColumn("rk", row_number().over(
          Window.partitionBy("nprobe").orderBy(col("cos_r").desc, col("vec_id"))))
        .filter(col("rk") <= 10)
      val exact = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"), cosineR6(col("v"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id")).limit(10)
        .select("vec_id")
      val nc = cand.groupBy("nprobe").agg(count(lit(1)).as("n_candidates"))
      top10.join(exact.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
        .groupBy("nprobe").agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .join(nc, "nprobe")
        .withColumn("recall_e4", expr("n_hit * 10000 div 10"))
        .withColumn("cand_share_e4", expr(s"n_candidates * 10000 div ${nCorpus}L"))
        .select("nprobe", "n_candidates", "cand_share_e4", "n_hit", "recall_e4")
        .orderBy("nprobe")
    }),

    // ── G477: mixture-temperature economics (uniform / sqrt / prop) ────
    "q532_mixture_temperature" -> ((s, dir) => {
      val src = Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n"))
      // exact integer sqrt: float sqrt then ±1 guard (engine-identical)
      val isq = "case when (cast(sqrt(n) as bigint) + 1) * " +
        "(cast(sqrt(n) as bigint) + 1) <= n then cast(sqrt(n) as bigint) + 1 " +
        "when cast(sqrt(n) as bigint) * cast(sqrt(n) as bigint) > n " +
        "then cast(sqrt(n) as bigint) - 1 else cast(sqrt(n) as bigint) end"
      val weighted = src
        .select(col("source"), col("n"), lit("1_uniform").as("policy"),
          lit(1L).as("w"))
        .unionByName(src.select(col("source"), col("n"),
          lit("2_sqrt").as("policy"), expr(isq).as("w")))
        .unionByName(src.select(col("source"), col("n"),
          lit("3_proportional").as("policy"), col("n").as("w")))
      val tot = weighted.groupBy("policy")
        .agg(sum("w").as("w_tot"), sum("n").as("n_tot"),
          count(lit(1)).as("n_sources"))
      // expected draws from s in one corpus-sized pass = w_s/W · N;
      // epochs of source s = draws/n_s
      weighted.join(broadcast(tot), "policy")
        .withColumn("epochs_e4", expr("w * n_tot * 10000 div (w_tot * n)"))
        .withColumn("share_e6", expr("w * 1000000 div w_tot"))
        .groupBy("policy")
        .agg(max("n_sources").as("n_sources"),
          max("epochs_e4").as("max_epochs_e4"),
          min("epochs_e4").as("min_epochs_e4"),
          max("share_e6").as("max_share_e6"))
        .withColumn("imbalance_e4", expr(
          "max_epochs_e4 * 10000 div greatest(min_epochs_e4, 1L)"))
        .select("policy", "n_sources", "max_epochs_e4", "min_epochs_e4",
          "imbalance_e4", "max_share_e6")
        .orderBy("policy")
    }),

    // ── G478: dup-cluster purity (cross-source deletion risk) ──────────
    "q533_cluster_purity" -> ((s, dir) => {
      val comp = FeatureQueries.componentsTable(s, dir)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang"))
      val member = comp.join(d, "doc_id")
      val perC = member.groupBy("comp")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_sources"),
          countDistinct("lang").as("n_langs"),
          min("doc_id").as("canon"))
      val real = perC.filter(col("n_docs") >= 2)
      // docs the q79 rule (keep min doc_id) would delete from a source
      // OTHER than the canonical's — the cross-source deletion risk
      val canonSrc = real.select(col("comp"), col("canon"))
        .join(d.select(col("doc_id").as("canon"), col("source").as("csrc")), "canon")
      val risk = member.join(broadcast(canonSrc), "comp")
        .filter(col("doc_id") =!= col("canon") && col("source") =!= col("csrc"))
        .agg(count(lit(1)).as("n_cross_deleted"))
      real.agg(count(lit(1)).as("n_clusters"),
          sum("n_docs").as("n_docs_clustered"),
          sum(expr("case when n_sources > 1 then 1L else 0L end"))
            .as("n_multi_source"),
          sum(expr("case when n_langs > 1 then 1L else 0L end"))
            .as("n_multi_lang"),
          max("n_docs").as("largest_cluster"))
        .crossJoin(risk)
        .withColumn("multi_source_share_e4", expr(
          "n_multi_source * 10000 div n_clusters"))
        .select("n_clusters", "n_docs_clustered", "largest_cluster",
          "n_multi_source", "multi_source_share_e4", "n_multi_lang",
          "n_cross_deleted")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q531_ivf_nprobe_sweep" -> {
      val cos = graft.functions.VectorFunctions.sqlCosineR6 _
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |seeds AS MATERIALIZED (SELECT vec_id AS seed_id, v AS sv FROM e
        |        WHERE vec_id BETWEEN 1 AND 8),
        |asg AS (SELECT vec_id, v, seed_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY ${cos("v", "sv")} DESC, seed_id) AS rn
        |  FROM e CROSS JOIN seeds),
        |cells AS MATERIALIZED (SELECT vec_id, v, seed_id AS cell FROM asg
        |        WHERE rn = 1),
        |qv AS MATERIALIZED (SELECT v AS qe FROM e WHERE vec_id = 0),
        |crank AS (SELECT seed_id AS cell, row_number() OVER
        |    (ORDER BY ${cos("sv", "qe")} DESC, seed_id) AS crk
        |  FROM seeds, qv),
        |probes AS (SELECT p.nprobe, c.cell
        |  FROM (SELECT UNNEST([${Probes.mkString(", ")}]) AS nprobe) p
        |  JOIN crank c ON c.crk <= p.nprobe),
        |ncorp AS (SELECT COUNT(*) AS n_corpus FROM e WHERE vec_id != 0),
        |cand AS MATERIALIZED (SELECT pr.nprobe, c.vec_id, c.v
        |  FROM cells c JOIN probes pr ON c.cell = pr.cell
        |  WHERE c.vec_id != 0),
        |scored AS (SELECT nprobe, vec_id, ${cos("v", "qe")} AS cos_r
        |           FROM cand, qv),
        |top10 AS (SELECT nprobe, vec_id FROM (
        |    SELECT nprobe, vec_id, row_number() OVER (PARTITION BY nprobe
        |      ORDER BY cos_r DESC, vec_id) AS rk FROM scored) z
        |  WHERE rk <= 10),
        |exact AS (SELECT vec_id FROM
        |    (SELECT vec_id, ${cos("v", "qe")} AS cos_r FROM e, qv
        |     WHERE vec_id != 0) z
        |  ORDER BY cos_r DESC, vec_id LIMIT 10),
        |nc AS (SELECT nprobe, COUNT(*) AS n_candidates FROM cand GROUP BY 1)
        |SELECT CAST(t.nprobe AS BIGINT) AS nprobe,
        |  CAST(nc.n_candidates AS BIGINT) AS n_candidates,
        |  CAST(nc.n_candidates * 10000 // ncorp.n_corpus AS BIGINT)
        |    AS cand_share_e4,
        |  CAST(SUM(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 10000 // 10 AS BIGINT) AS recall_e4
        |FROM top10 t LEFT JOIN exact ex ON t.vec_id = ex.vec_id
        |JOIN nc ON t.nprobe = nc.nprobe, ncorp
        |GROUP BY t.nprobe, nc.n_candidates, ncorp.n_corpus
        |ORDER BY nprobe""".stripMargin
    },

    "q532_mixture_temperature" ->
      """WITH src AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        |isq AS (SELECT source, n,
        |    CASE WHEN (CAST(sqrt(n) AS BIGINT) + 1) *
        |      (CAST(sqrt(n) AS BIGINT) + 1) <= n
        |      THEN CAST(sqrt(n) AS BIGINT) + 1
        |      WHEN CAST(sqrt(n) AS BIGINT) * CAST(sqrt(n) AS BIGINT) > n
        |      THEN CAST(sqrt(n) AS BIGINT) - 1
        |      ELSE CAST(sqrt(n) AS BIGINT) END AS sq
        |  FROM src),
        |weighted AS (
        |  SELECT source, n, '1_uniform' AS policy, 1::BIGINT AS w FROM isq
        |  UNION ALL SELECT source, n, '2_sqrt', sq FROM isq
        |  UNION ALL SELECT source, n, '3_proportional', n FROM isq),
        |tot AS (SELECT policy, SUM(w) AS w_tot, SUM(n) AS n_tot,
        |    COUNT(*) AS n_sources FROM weighted GROUP BY 1),
        |x AS (SELECT w.policy, tot.n_sources,
        |    w.w * tot.n_tot * 10000 // (tot.w_tot * w.n) AS epochs_e4,
        |    w.w * 1000000 // tot.w_tot AS share_e6
        |  FROM weighted w JOIN tot ON w.policy = tot.policy)
        |SELECT policy, CAST(MAX(n_sources) AS BIGINT) AS n_sources,
        |  CAST(MAX(epochs_e4) AS BIGINT) AS max_epochs_e4,
        |  CAST(MIN(epochs_e4) AS BIGINT) AS min_epochs_e4,
        |  CAST(MAX(epochs_e4) * 10000 // GREATEST(MIN(epochs_e4), 1)
        |    AS BIGINT) AS imbalance_e4,
        |  CAST(MAX(share_e6) AS BIGINT) AS max_share_e6
        |FROM x GROUP BY policy ORDER BY policy""".stripMargin,

    "q533_cluster_purity" -> {
      s"""${FeatureQueries.ccCte},
        |comp AS MATERIALIZED (SELECT id AS doc_id, lbl AS comp
        |  FROM l${FeatureQueries.CcRounds}),
        |member AS MATERIALIZED (SELECT c.comp, c.doc_id, d.source, d.lang
        |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
        |perc AS MATERIALIZED (SELECT comp, COUNT(*) AS n_docs,
        |    COUNT(DISTINCT source) AS n_sources,
        |    COUNT(DISTINCT lang) AS n_langs,
        |    MIN(doc_id) AS canon
        |  FROM member GROUP BY comp),
        |realc AS (SELECT * FROM perc WHERE n_docs >= 2),
        |csrc AS (SELECT r.comp, r.canon, d.source AS csrc
        |  FROM realc r JOIN documents d ON r.canon = d.doc_id),
        |risk AS (SELECT COUNT(*) AS n_cross_deleted
        |  FROM member m JOIN csrc ON m.comp = csrc.comp
        |  WHERE m.doc_id != csrc.canon AND m.source != csrc.csrc)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs_clustered,
        |  CAST(MAX(n_docs) AS BIGINT) AS largest_cluster,
        |  CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_multi_source,
        |  CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) * 10000
        |    // COUNT(*) AS BIGINT) AS multi_source_share_e4,
        |  CAST(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_multi_lang,
        |  CAST(MAX(risk.n_cross_deleted) AS BIGINT) AS n_cross_deleted
        |FROM realc, risk""".stripMargin
    }
  )
}
