package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens, stopwordCount, sqlStopwordCount, EnStop}
import graft.ops.Relational.contiguousIds

/** The full corpus-RELEASE flagship (VERDICT r13 "next" #6): everything
  * between a raw crawl and the manifest a training run consumes, as ONE
  * declarative plan. The reference's analogue is the weekly DAG chaining
  * train→predict→write-back (train_predict_to_db_dag.py:76-83) — here
  * the chained stages are the curation operators the engine already
  * certifies individually:
  *
  *   1. decontamination (q110's chunk machinery): any training doc
  *      sharing a 50-token window with the held-out source (src7) is
  *      dropped; src7 itself never enters the training universe;
  *   2. canonical-per-dup-cluster (q79/q87's policy) — computed among
  *      the DECONTAMINATION SURVIVORS, so a cluster whose longest doc
  *      was contaminated still keeps its best clean member;
  *   3. quality gate (q18/q87's rule: ≥10 tokens ∧ stopword share
  *      ≥ 2%);
  *   4. mixture sampling (q89's weights) over the per-source CANDIDATE
  *      pool — rank by md5(doc_id), keep ⌊n_cand·w⌋ (deterministic,
  *      stable as sources grow);
  *   5. sequence packing (q85/q87's 512-token bins), per source;
  *   6. contiguous global example ids (q104's parallel ROW_NUMBER — no
  *      global window) over the final kept set in doc_id order.
  *
  * Every dropped doc is attributed to the FIRST gate that dropped it
  * (decon > dup > quality > mixture), the way a release report explains
  * attrition. The manifest emits, per source: stage drop counts, the
  * mixture target and realized keep, token totals, packed-bin count,
  * the id span + checksum (certifying the q104 composition against the
  * oracle's ROW_NUMBER), and n_contaminated_final — RE-MEASURED on the
  * released set, not assumed — which the oracle hash certifies to be
  * exactly zero.
  *
  * Scale shape: the only corpus-wide scans are documents (token stats,
  * chunk stream) and the materialized CC table; chunk decon is
  * Bloom-pruned (q110), every window is (source)- or (comp)-
  * partitioned, and the one global ordering (example ids) uses the
  * range-repartition + per-partition-offset form that never funnels
  * rows through a single task.
  */
object ReleaseQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G516: corpus release manifest (decon ∘ dedup ∘ quality ∘
    //          mixture ∘ pack ∘ ids) ────────────────────────────────────
    "q571_corpus_release" -> ((s, dir) => {
      import s.implicits._
      val weights = Seq(
        "src0" -> 10000L, "src1" -> 7500L, "src2" -> 5000L, "src3" -> 5000L,
        "src4" -> 2500L, "src5" -> 2500L, "src6" -> 2500L, "src7" -> 1000L,
        "src8" -> 1000L, "src9" -> 1000L).toDF("source", "w_e4")
      val docs = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          stopwordCount(col("toks"), EnStop).cast(LongType).as("n_stop"))
      // 1 — decontamination: Bloom-pruned chunk semi-join vs src7
      val chunks = AuditQueries.chunkRows(s, dir)
      val block = chunks.filter(col("source") === "src7")
        .select(col("chunk_md5")).distinct()
      // localCheckpoint: read twice (gate attribution AND the released-set
      // re-measure) — lazy, the whole Bloom-pruned chunk pass ran twice
      val contaminated = graft.ops.Bloom
        .semiJoin(chunks.filter(col("source") =!= "src7"), block, "chunk_md5")
        .select(col("doc_id")).distinct()
        .withColumn("contam", lit(1L))
        .localCheckpoint()
      val train = docs.filter(col("source") =!= "src7")
        .join(contaminated, Seq("doc_id"), "left")
      // 2 — canonical per dup cluster, ranked among decon survivors
      val wCanon = Window.partitionBy("comp")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val canon = train.filter(col("contam").isNull)
        .join(FeatureQueries.componentsTable(s, dir), "doc_id")
        .withColumn("rn", row_number().over(wCanon))
        .filter(col("rn") === 1)
        .select(col("doc_id")).withColumn("is_canon", lit(1L))
      // 3 — first-failing-gate attribution (decon > dup > quality > cand)
      // localCheckpoint: the attribution frame feeds both the candidate
      // chain and the per-source stage census (guide §3.3)
      val flags = train.join(canon, Seq("doc_id"), "left")
        .withColumn("stage",
          when(col("contam").isNotNull, "decon")
            .when(col("is_canon").isNull, "dup")
            .when(expr("n_tokens >= 10 and n_stop * 10000 div n_tokens >= 200"),
              "cand")
            .otherwise("quality"))
        .localCheckpoint()
      // 4 — mixture sampling over the per-source candidate pool
      val cand = flags.filter(col("stage") === "cand")
        .withColumn("h", md5(col("doc_id").cast(StringType)))
      val nc = cand.groupBy("source").agg(count(lit(1)).as("n_cand"))
      val wMix = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      val kept = cand
        .withColumn("rk", row_number().over(wMix).cast(LongType))
        .join(broadcast(nc.join(weights, "source")), "source")
        .withColumn("n_keep", expr("n_cand * w_e4 div 10000"))
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "source", "n_tokens")
        // localCheckpoint: contiguousIds' range sampling + zipWithIndex
        // would otherwise re-run the whole kept-set lineage twice more
        .localCheckpoint()
      // 6 — contiguous global ids over the release, doc_id order
      //     (the q104 form: range-repartition + per-partition offsets)
      val ids = contiguousIds(
        kept.repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id"),
        "row_id")
      // 5 — packing per source + final per-source manifest grain
      val wPack = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val perSrc = ids
        .join(contaminated, Seq("doc_id"), "left")
        .withColumn("run", coalesce(sum(col("n_tokens")).over(wPack), lit(0L)))
        .withColumn("bin", expr("run div 512"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_tokens").as("kept_tokens"),
          (max("bin") + 1L).as("n_bins"),
          min("row_id").as("id_min"), max("row_id").as("id_max"),
          sum("row_id").as("id_checksum"),
          sum(when(col("contam").isNotNull, 1L).otherwise(0L))
            .as("n_contaminated_final"))
      val stages = flags.groupBy("source").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("stage") === "decon", 1L).otherwise(0L)).as("n_decon_dropped"),
        sum(when(col("stage") === "dup", 1L).otherwise(0L)).as("n_dup_dropped"),
        sum(when(col("stage") === "quality", 1L).otherwise(0L)).as("n_quality_dropped"),
        sum(when(col("stage") === "cand", 1L).otherwise(0L)).as("n_candidates"))
      stages.join(broadcast(weights), "source")
        .join(perSrc, Seq("source"), "left")
        .withColumn("n_keep", expr("n_candidates * w_e4 div 10000"))
        .na.fill(0L, Seq("n_kept", "kept_tokens", "n_bins",
          "n_contaminated_final", "id_checksum"))
        .na.fill(-1L, Seq("id_min", "id_max"))
        .withColumn("pct_kept_e4", expr("n_kept * 10000 div n_total"))
        .select("source", "n_total", "n_decon_dropped", "n_dup_dropped",
          "n_quality_dropped", "n_candidates", "n_keep", "n_kept",
          "kept_tokens", "n_bins", "n_contaminated_final", "id_min",
          "id_max", "id_checksum", "pct_kept_e4")
        .orderBy("source")
    })
  )

  private val toks = sqlTokens("text")

  def oracleSql: Map[String, String] = Map(

    "q571_corpus_release" ->
      s"""${FeatureQueries.ccCte},
         |cc AS (SELECT id AS doc_id, lbl AS comp FROM l${FeatureQueries.CcRounds}),
         |dq AS MATERIALIZED (SELECT doc_id, source, n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(${sqlStopwordCount("toks", EnStop)} AS BIGINT) AS n_stop
         |  FROM (SELECT doc_id, source, n_chars, $toks AS toks FROM documents)),
         |ct AS (SELECT doc_id, source, $toks AS toks FROM documents),
         |cn AS (SELECT doc_id, source, toks, CAST(len(toks) AS INT) AS n FROM ct),
         |cs AS (SELECT doc_id, source, toks, n,
         |    CAST(UNNEST(range(0, GREATEST(n - 26, 0) + 1, 25)) AS INT) AS start
         |  FROM cn),
         |ch AS MATERIALIZED (SELECT doc_id, source,
         |    md5(array_to_string(list_slice(toks, start + 1,
         |      start + LEAST(50, n - start)), ' ')) AS h
         |  FROM cs),
         |blk AS (SELECT DISTINCT h FROM ch WHERE source = 'src7'),
         |contam AS MATERIALIZED (SELECT DISTINCT c.doc_id FROM ch c
         |  JOIN blk ON c.h = blk.h WHERE c.source <> 'src7'),
         |train AS MATERIALIZED (SELECT dq.* FROM dq WHERE source <> 'src7'),
         |deconok AS (SELECT t.* FROM train t LEFT JOIN contam x
         |  ON t.doc_id = x.doc_id WHERE x.doc_id IS NULL),
         |canon AS MATERIALIZED (SELECT doc_id FROM (
         |    SELECT d.doc_id, ROW_NUMBER() OVER (PARTITION BY cc.comp
         |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
         |    FROM deconok d JOIN cc ON d.doc_id = cc.doc_id) WHERE rn = 1),
         |flags AS MATERIALIZED (SELECT t.doc_id, t.source, t.n_tokens,
         |    CASE WHEN x.doc_id IS NOT NULL THEN 'decon'
         |         WHEN c.doc_id IS NULL THEN 'dup'
         |         WHEN t.n_tokens >= 10 AND t.n_stop * 10000 // t.n_tokens >= 200
         |           THEN 'cand'
         |         ELSE 'quality' END AS stage
         |  FROM train t LEFT JOIN contam x ON t.doc_id = x.doc_id
         |  LEFT JOIN canon c ON t.doc_id = c.doc_id),
         |wt(source, w_e4) AS (VALUES
         |  ('src0', 10000), ('src1', 7500), ('src2', 5000), ('src3', 5000),
         |  ('src4', 2500), ('src5', 2500), ('src6', 2500), ('src7', 1000),
         |  ('src8', 1000), ('src9', 1000)),
         |candx AS (SELECT f.doc_id, f.source, f.n_tokens,
         |    md5(CAST(f.doc_id AS VARCHAR)) AS h
         |  FROM flags f WHERE stage = 'cand'),
         |ncand AS (SELECT source, COUNT(*) AS n_cand FROM candx GROUP BY source),
         |rkx AS (SELECT c.doc_id, c.source, c.n_tokens,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY c.source
         |      ORDER BY c.h, c.doc_id) AS BIGINT) AS rk,
         |    n.n_cand * wt.w_e4 // 10000 AS n_keep
         |  FROM candx c JOIN ncand n ON c.source = n.source
         |  JOIN wt ON c.source = wt.source),
         |keptx AS MATERIALIZED (SELECT doc_id, source, n_tokens FROM rkx
         |  WHERE rk <= n_keep),
         |idsx AS MATERIALIZED (SELECT doc_id, source, n_tokens,
         |    CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
         |  FROM keptx),
         |persrc AS (SELECT i.source, COUNT(*) AS n_kept,
         |    SUM(i.n_tokens) AS kept_tokens,
         |    MAX(i.run // 512) + 1 AS n_bins,
         |    MIN(i.row_id) AS id_min, MAX(i.row_id) AS id_max,
         |    SUM(i.row_id) AS id_checksum,
         |    SUM(CASE WHEN x.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS n_contaminated_final
         |  FROM idsx i LEFT JOIN contam x ON i.doc_id = x.doc_id
         |  GROUP BY i.source),
         |stg AS (SELECT source, COUNT(*) AS n_total,
         |    SUM(CASE WHEN stage = 'decon' THEN 1 ELSE 0 END) AS n_decon_dropped,
         |    SUM(CASE WHEN stage = 'dup' THEN 1 ELSE 0 END) AS n_dup_dropped,
         |    SUM(CASE WHEN stage = 'quality' THEN 1 ELSE 0 END) AS n_quality_dropped,
         |    SUM(CASE WHEN stage = 'cand' THEN 1 ELSE 0 END) AS n_candidates
         |  FROM flags GROUP BY source)
         |SELECT s.source, CAST(s.n_total AS BIGINT) AS n_total,
         |  CAST(s.n_decon_dropped AS BIGINT) AS n_decon_dropped,
         |  CAST(s.n_dup_dropped AS BIGINT) AS n_dup_dropped,
         |  CAST(s.n_quality_dropped AS BIGINT) AS n_quality_dropped,
         |  CAST(s.n_candidates AS BIGINT) AS n_candidates,
         |  CAST(s.n_candidates * wt.w_e4 // 10000 AS BIGINT) AS n_keep,
         |  CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(COALESCE(p.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  CAST(COALESCE(p.n_bins, 0) AS BIGINT) AS n_bins,
         |  CAST(COALESCE(p.n_contaminated_final, 0) AS BIGINT)
         |    AS n_contaminated_final,
         |  CAST(COALESCE(p.id_min, -1) AS BIGINT) AS id_min,
         |  CAST(COALESCE(p.id_max, -1) AS BIGINT) AS id_max,
         |  CAST(COALESCE(p.id_checksum, 0) AS BIGINT) AS id_checksum,
         |  CAST(COALESCE(p.n_kept, 0) * 10000 // s.n_total AS BIGINT)
         |    AS pct_kept_e4
         |FROM stg s JOIN wt ON s.source = wt.source
         |LEFT JOIN persrc p ON s.source = p.source
         |ORDER BY s.source""".stripMargin
  )
}
