package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.functions.VectorFunctions.{asDouble, cosineR6, sqlCosineR6}

/** Training-mixture engineering (round 10, twenty-fourth wave): a
  * mergeable SpaceSaving heavy-hitters sketch certified against the
  * exact answer, leave-one-source-out ablation of a corpus quality
  * metric, a curriculum interleave manifest, and hard positive/negative
  * mining for contrastive embedding training.
  *
  * Reference intent: the reference trains on one fixed Rossmann CSV —
  * no mixture weighting, no curriculum, no sketch-sized telemetry
  * (services/airflow/dags/task_operators.py loads the table whole;
  * services/training-service/app/train_utils.py:56-68 filters one
  * store). These are the decisions a 100-TB training-data pipeline
  * makes about WHAT to feed the model, stated as exact oracle-gated
  * queries. House disciplines: scaled-BIGINT floor division, id
  * tiebreaks on every ordering, sketch queries emit only merge-order-
  * invariant guaranteed facts.
  */
object MixtureQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G212: SpaceSaving top-k sketch, certified (heavy hitters) ──────
    // The token-frequency telemetry a curation fleet actually ships:
    // `spacesaving(tok, 256)` (plans/Aggregates.scala) keeps 256
    // counters per partial aggregate and merges associatively — k rows
    // per mapper cross the wire, vs the exact form's full key-universe
    // shuffle. Per-item estimates are merge-order-dependent (Spark task
    // order varies run to run), so the query emits only the sketch's
    // GUARANTEED facts, checked against the exact top-5: membership
    // (true count > n/k forces tracking), the bracket est−err ≤ true ≤
    // est, and the error bound err ≤ n div k — each would flip to false
    // if the kernel broke an invariant, and all are deterministic under
    // any merge order. The exact side is one groupBy + TakeOrdered.
    "q267_spacesaving_topk" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("tok"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      val top5 = exact.orderBy(col("exact_cnt").desc, col("tok").asc).limit(5)
      val n = toks.agg(count(lit(1)).as("n_total"))
      val sk = toks.agg(expr("spacesaving(tok, 256)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("tok"), col("e.est").as("est"), col("e.err").as("err"))
      top5.join(sk, Seq("tok"), "left").crossJoin(broadcast(n))
        .select(col("tok"), col("exact_cnt"),
          col("est").isNotNull.as("in_sketch"),
          coalesce(col("est") >= col("exact_cnt") &&
            col("est") - col("err") <= col("exact_cnt"), lit(false)).as("bracket_ok"),
          coalesce(col("err") <= expr("n_total div 256"), lit(false)).as("err_ok"))
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // ── G213: leave-one-source-out ablation (data-mixture valuation) ───
    // Which source is dragging the corpus quality metric? For every
    // source: the corpus-wide mean type-token ratio WITHOUT that source,
    // and its delta vs the full-corpus mean — the one-pass form of the
    // ablation sweep (mean_excl = (Σ − Σ_src)/(n − n_src), so the whole
    // sweep costs ONE per-source aggregate + a broadcast 1-row total;
    // q242's exact Shapley is the 3-player exact version, this is the
    // per-source marginal at corpus scale). Deltas are differences of
    // already-floored positive means — no negative-operand division.
    "q268_source_ablation" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("source"), tokens(col("text")).as("toks"))
        .select(col("source"),
          expr("size(toks)").cast(LongType).as("n_tokens"),
          expr("size(array_distinct(toks))").cast(LongType).as("n_types"))
        .filter(col("n_tokens") > 0)
        .withColumn("ttr_e4", expr("n_types * 10000 div n_tokens"))
      val per = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ttr_e4").as("ttr_sum"))
      per.crossJoin(broadcast(per.agg(sum("n_docs").as("tn"), sum("ttr_sum").as("ts"))))
        .withColumn("mean_full_e4", expr("ts div tn"))
        .withColumn("mean_excl_e4", expr("(ts - ttr_sum) div (tn - n_docs)"))
        .withColumn("delta_e4", col("mean_excl_e4") - col("mean_full_e4"))
        .select("source", "n_docs", "mean_full_e4", "mean_excl_e4", "delta_e4")
        .orderBy("source")
    }),

    // ── G214: curriculum interleave manifest (difficulty round-robin) ──
    // Length-based curriculum: docs into exact difficulty deciles
    // (Relational.distributedNtile — the scale-safe NTILE), then the
    // training order interleaves deciles round-robin: sort by (rank
    // within decile, decile), so every consecutive run of ≤10 examples
    // spans the difficulty spectrum. Global positions come from
    // contiguousIds over the range-partitioned (r, decile) sort — the
    // corpus-scale ROW_NUMBER replacement. The manifest (per decile:
    // span of positions, mass) is what a data-loader shards on.
    "q269_curriculum_manifest" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("difficulty"))
      val dec = graft.ops.Relational.distributedNtile(d,
          Seq(col("difficulty").asc, col("doc_id").asc), 10,
          d.agg(count(lit(1)).as("n_total")), "decile")
        .withColumn("decile", col("decile").cast(LongType))
      val r = dec.withColumn("r", row_number().over(
        Window.partitionBy("decile").orderBy(col("difficulty").asc, col("doc_id").asc))
        .cast(LongType))
      val pos = graft.ops.Relational.contiguousIds(
        r.repartitionByRange(32, col("r"), col("decile"))
          .sortWithinPartitions("r", "decile"), "pos0")
      pos.groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          (min(col("pos0")) + 1).as("first_pos"),
          (max(col("pos0")) + 1).as("last_pos"),
          sum("difficulty").as("sum_difficulty"))
        .orderBy("decile")
    }),

    // ── G215: hard positive/negative mining (contrastive pair build) ───
    // The embedding-training data op: for 20 hash-picked anchors (a
    // FIXED count — TakeOrdered by md5, so the probe work stays 20·|V|
    // as the corpus grows), the most-similar SAME-label vector (hard
    // positive) and most-similar OTHER-label vector (hard negative) by
    // exact cosine, id tiebreaks. Anchors broadcast; the corpus scan is
    // embarrassingly parallel (q26's shape × 20); per-(anchor, side)
    // argmax is a PARTITIONED window. A tight or inverted pos/neg gap
    // is exactly the pair a contrastive batch builder wants.
    "q270_hard_negatives" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val anchors = e
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(20)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("v").as("av"))
      val scored = e.crossJoin(broadcast(anchors))
        .filter(col("vec_id") =!= col("anchor_id"))
        .withColumn("side", when(col("label") === col("a_label"), "pos").otherwise("neg"))
        .withColumn("cos_r", cosineR6(col("av"), col("v")))
      val best = scored.withColumn("rn", row_number().over(
          Window.partitionBy("anchor_id", "side")
            .orderBy(col("cos_r").desc, col("vec_id").asc)))
        .filter(col("rn") === 1)
      best.groupBy(col("anchor_id"), col("a_label").as("label"))
        .agg(max(when(col("side") === "pos", col("vec_id"))).as("pos_id"),
          max(when(col("side") === "pos", col("cos_r"))).as("pos_cos"),
          max(when(col("side") === "neg", col("vec_id"))).as("neg_id"),
          max(when(col("side") === "neg", col("cos_r"))).as("neg_cos"))
        .orderBy("anchor_id")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q267_spacesaving_topk" ->
      s"""WITH t AS (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents),
         |c AS (SELECT tok, COUNT(*) AS exact_cnt FROM t GROUP BY tok)
         |SELECT tok, CAST(exact_cnt AS BIGINT) AS exact_cnt,
         |       TRUE AS in_sketch, TRUE AS bracket_ok, TRUE AS err_ok
         |FROM c ORDER BY exact_cnt DESC, tok LIMIT 5""".stripMargin,

    "q268_source_ablation" ->
      s"""WITH d AS (SELECT source, ${sqlTokens("text")} AS toks FROM documents),
         |u AS (SELECT source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(toks)) AS BIGINT) AS n_types
         |      FROM d WHERE len(toks) > 0),
         |v AS (SELECT source, n_types * 10000 // n_tokens AS ttr FROM u),
         |p AS (SELECT source, COUNT(*) AS n_docs, SUM(ttr) AS ttr_sum
         |      FROM v GROUP BY source),
         |t AS (SELECT SUM(n_docs) AS tn, SUM(ttr_sum) AS ts FROM p)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(ts // tn AS BIGINT) AS mean_full_e4,
         |       CAST((ts - ttr_sum) // (tn - n_docs) AS BIGINT) AS mean_excl_e4,
         |       CAST((ts - ttr_sum) // (tn - n_docs) - ts // tn AS BIGINT) AS delta_e4
         |FROM p, t ORDER BY source""".stripMargin,

    "q269_curriculum_manifest" ->
      s"""WITH d AS (SELECT doc_id,
         |             CAST(len(${sqlTokens("text")}) AS BIGINT) AS difficulty
         |           FROM documents),
         |x AS (SELECT doc_id, difficulty,
         |        CAST(NTILE(10) OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS decile
         |      FROM d),
         |y AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY decile ORDER BY difficulty, doc_id) AS r FROM x),
         |z AS (SELECT *, ROW_NUMBER() OVER (ORDER BY r, decile) AS pos FROM y)
         |SELECT decile, COUNT(*) AS n_docs,
         |       CAST(MIN(pos) AS BIGINT) AS first_pos,
         |       CAST(MAX(pos) AS BIGINT) AS last_pos,
         |       CAST(SUM(difficulty) AS BIGINT) AS sum_difficulty
         |FROM z GROUP BY decile ORDER BY decile""".stripMargin,

    "q270_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |a AS (SELECT vec_id AS anchor_id, label AS a_label, v AS av FROM e
         |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20),
         |c AS (SELECT anchor_id, a_label, e.vec_id AS vec_id,
         |        CASE WHEN e.label = a_label THEN 'pos' ELSE 'neg' END AS side,
         |        ${sqlCosineR6("av", "e.v")} AS cos_r
         |      FROM a JOIN e ON e.vec_id != anchor_id),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY anchor_id, side ORDER BY cos_r DESC, vec_id) AS rn
         |      FROM c)
         |SELECT anchor_id, a_label AS label,
         |       MAX(CASE WHEN side = 'pos' THEN vec_id END) AS pos_id,
         |       MAX(CASE WHEN side = 'pos' THEN cos_r END) AS pos_cos,
         |       MAX(CASE WHEN side = 'neg' THEN vec_id END) AS neg_id,
         |       MAX(CASE WHEN side = 'neg' THEN cos_r END) AS neg_cos
         |FROM r WHERE rn = 1 GROUP BY anchor_id, a_label
         |ORDER BY anchor_id""".stripMargin
  )
}
