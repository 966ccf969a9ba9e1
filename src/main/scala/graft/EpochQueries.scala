package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}

/** Generalization ladders + the epoch-build flagship (round 10,
  * thirty-first wave): a k-anonymity generalization ladder that picks
  * the coarsest-needed quasi-id granularity, and q300 — the end-to-end
  * epoch builder composing quality filter ∘ exact dedup ∘ n-gram
  * decontamination ∘ curriculum ∘ snake sharding into ONE manifest.
  *
  * Reference intent: the reference ships raw rows to Postgres and
  * trains on whatever arrives (services/airflow/dags/
  * task_operators.py); it neither anonymizes nor curates. q299 extends
  * q140/q231's point-in-time audits into the DECISION op (which
  * granularity to publish); q300 is the one-job composition of the
  * wave-25..30 primitives that an actual 100-TB training run submits
  * nightly.
  */
object EpochQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G244: k-anonymity generalization ladder ────────────────────────
    // q140 measures re-identification risk at ONE granularity; this op
    // evaluates the whole ladder (quasi-id = status × priority × order
    // date at day/week/month) in one scan each and emits, per level,
    // the group census and rows-at-risk under k=5 — plus the ladder
    // DECISION: the first level whose risk is zero (the granularity a
    // privacy office actually publishes). Generalization is monotone
    // (coarser ⇒ risk can only fall), spec-asserted.
    "q299_anonymity_ladder" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderstatus").as("st"),
        col("o_orderpriority").as("pr"), to_date(col("o_orderdate")).as("d"))
      def level(name: String, rank: Long, g: Column): DataFrame =
        o.groupBy(col("st"), col("pr"), g.as("bucket"))
          .agg(count(lit(1)).as("gsize"))
          .agg(count(lit(1)).as("n_groups"), min("gsize").as("min_group"),
            sum(when(col("gsize") < 5, 1L).otherwise(0L)).as("groups_below_k"),
            sum(when(col("gsize") < 5, col("gsize")).otherwise(0L)).as("rows_at_risk"))
          .select(lit(name).as("level"), lit(rank).as("rank"),
            col("n_groups"), col("min_group"), col("groups_below_k"), col("rows_at_risk"))
      val ladder = level("1_day", 1L, col("d"))
        .unionAll(level("2_week", 2L, date_trunc("week", col("d")).cast(DateType)))
        .unionAll(level("3_month", 3L, date_trunc("month", col("d")).cast(DateType)))
      val chosen = ladder.filter(col("groups_below_k") === 0)
        .agg(min("rank").as("chosen_rank"))
      ladder.crossJoin(broadcast(chosen))
        .select(col("level"), col("n_groups"), col("min_group"),
          col("groups_below_k"), col("rows_at_risk"),
          (col("rank") === col("chosen_rank")).as("chosen"))
        .orderBy("level")
    }),

    // ── G245: epoch build (the one-job training-data composition) ──────
    // documents → (1) quality gate (≥20 tokens AND type-token ratio ≥
    // 0.25 — the q18 family's cheapest two predicates), (2) exact
    // dedup (min doc_id per md5(text), the q21 discipline), (3)
    // decontamination: drop any doc sharing a 5-gram with the 20
    // hash-picked eval docs (q82/q110's check inlined; eval docs are
    // themselves excluded), (4) curriculum decile by token count
    // (distributedNtile), (5) snake shard from the same global rank —
    // ONE manifest row per (shard, decile) with doc count and token
    // mass. Every stage is a shape this library already certifies
    // alone; q300 certifies the COMPOSITION end-to-end against one
    // DuckDB mirror. Corpus cost: two token scans (quality+rank, and
    // the 5-gram explode), both map-combined.
    "q300_epoch_build" -> ((s, dir) => {
      // one scan computes everything derived from text (fingerprint,
      // counts); text crosses exactly ONE round-robin exchange (the
      // scan spread below — a no-op on multi-file inputs) and never a
      // keyed shuffle — every later stage moves (doc_id, fp, n_toks)
      // triples only
      val d = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(col("doc_id"), md5(col("text")).as("fp"),
          tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("fp"),
          expr("size(toks)").cast(LongType).as("n_toks"),
          expr("size(array_distinct(toks))").cast(LongType).as("n_types"))
      // (1) quality gate
      val q = d.filter(col("n_toks") >= 20 && col("n_types") * 4 >= col("n_toks"))
      // (2) exact dedup: canonical = min doc_id per fingerprint
      val canonIds = q.groupBy("fp").agg(min("doc_id").as("doc_id"))
      // (3) decontamination vs the hash-picked eval set. Computed over
      // the RAW corpus (not the deduped survivors): membership for a
      // canon doc is identical either way, and scanning documents again
      // beats dragging text through the dedup join. Corpus-side grams
      // are not de-duplicated — the check is a broadcast semi-join
      // (eval grams are tiny), so duplicate g5 rows cost nothing, while
      // a distinct() would shuffle the whole corpus gram set to shrink
      // a broadcast input.
      val evalSet = Tables.documents(s, dir)
        .orderBy(md5(concat(lit("eval"), col("doc_id").cast("string"))), col("doc_id"))
        .limit(20).select(col("doc_id").as("eval_id"))
      def grams5(df: DataFrame, idCol: String): DataFrame = df
        .select(col(idCol), tokens(col("text")).as("t"))
        .filter(expr("size(t) >= 5"))
        .select(col(idCol), explode(expr(
          "transform(sequence(1, size(t) - 4), i -> concat_ws(' ', slice(t, i, 5)))")).as("g5"))
      val evalGrams = grams5(
        Tables.documents(s, dir).join(broadcast(evalSet),
          col("doc_id") === col("eval_id")), "eval_id")
        .select("g5").distinct()
      // spread: the corpus-side 5-gram explode otherwise runs inside the
      // single-row-group scan's one task (guide §2.5)
      val contaminated = grams5(
          graft.ops.Relational.spread(Tables.documents(s, dir)), "doc_id")
        .join(broadcast(evalGrams), Seq("g5"), "left_semi")
        .select("doc_id").distinct()
      val clean = q
        .join(canonIds.select("doc_id"), Seq("doc_id"), "left_semi")
        .join(broadcast(evalSet), col("doc_id") === col("eval_id"), "left_anti")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "n_toks")
      // (4)+(5) curriculum decile + snake shard from one global rank
      val ranked = graft.ops.Relational.contiguousIds(
        clean.repartitionByRange(32, col("n_toks").desc, col("doc_id").asc)
          .sortWithinPartitions(col("n_toks").desc, col("doc_id").asc), "r0")
      val n = clean.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(n))
        .withColumn("shard", expr(
          "case when (r0 div 8) % 2 = 0 then r0 % 8 else 7 - (r0 % 8) end"))
        // exact NTILE formula over the SAME rank (descending difficulty)
        .withColumn("decile", expr(
          """case when r0 < (n_total % 10) * (n_total div 10 + 1)
            |     then r0 div (n_total div 10 + 1) + 1
            |     else (n_total % 10)
            |          + (r0 - (n_total % 10) * (n_total div 10 + 1))
            |            div (n_total div 10) + 1 end""".stripMargin))
        .groupBy("shard", "decile")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_tokens"))
        .orderBy("shard", "decile")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q299_anonymity_ladder" ->
      """WITH o AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |                  CAST(o_orderdate AS DATE) AS d FROM orders),
        |lv AS (
        |  SELECT '1_day' AS level, 1 AS rank, st, pr, CAST(d AS VARCHAR) AS bucket FROM o
        |  UNION ALL
        |  SELECT '2_week', 2, st, pr, CAST(date_trunc('week', d) AS VARCHAR) FROM o
        |  UNION ALL
        |  SELECT '3_month', 3, st, pr, CAST(date_trunc('month', d) AS VARCHAR) FROM o),
        |g AS (SELECT level, rank, st, pr, bucket, COUNT(*) AS gsize
        |      FROM lv GROUP BY level, rank, st, pr, bucket),
        |l AS (SELECT level, rank, COUNT(*) AS n_groups, MIN(gsize) AS min_group,
        |        SUM(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS groups_below_k,
        |        SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS rows_at_risk
        |      FROM g GROUP BY level, rank),
        |c AS (SELECT MIN(rank) AS chosen_rank FROM l WHERE groups_below_k = 0)
        |SELECT level, CAST(n_groups AS BIGINT) AS n_groups,
        |       CAST(min_group AS BIGINT) AS min_group,
        |       CAST(groups_below_k AS BIGINT) AS groups_below_k,
        |       CAST(rows_at_risk AS BIGINT) AS rows_at_risk,
        |       l.rank = c.chosen_rank AS chosen
        |FROM l, c ORDER BY level""".stripMargin,

    "q300_epoch_build" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_toks,
         |    CAST(len(list_distinct(${sqlTokens("text")})) AS BIGINT) AS n_types
         |  FROM documents),
         |q AS (SELECT * FROM d WHERE n_toks >= 20 AND n_types * 4 >= n_toks),
         |canon AS (SELECT q.* FROM q JOIN
         |    (SELECT md5(text) AS fp, MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)) c
         |  USING (doc_id)),
         |ev AS (SELECT doc_id AS eval_id FROM documents
         |       ORDER BY md5('eval' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 20),
         |evg AS (SELECT DISTINCT g5 FROM (
         |    SELECT unnest(list_transform(range(1, len(t) - 3),
         |             i -> array_to_string(t[i:i+4], ' '))) AS g5
         |    FROM (SELECT ${sqlTokens("text")} AS t FROM documents JOIN ev
         |          ON doc_id = eval_id)
         |    WHERE len(t) >= 5)),
         |cont AS (SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
         |             i -> array_to_string(t[i:i+4], ' '))) AS g5
         |    FROM (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents)
         |    WHERE len(t) >= 5) x
         |  WHERE g5 IN (SELECT g5 FROM evg)),
         |clean AS (SELECT doc_id, n_toks FROM canon
         |          WHERE doc_id NOT IN (SELECT eval_id FROM ev)
         |            AND doc_id NOT IN (SELECT doc_id FROM cont)),
         |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) - 1 AS r0,
         |             COUNT(*) OVER () AS n_total
         |      FROM clean),
         |a AS (SELECT CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8 ELSE 7 - (r0 % 8) END AS shard,
         |        CASE WHEN r0 < (n_total % 10) * (n_total // 10 + 1)
         |             THEN r0 // (n_total // 10 + 1) + 1
         |             ELSE (n_total % 10)
         |                  + (r0 - (n_total % 10) * (n_total // 10 + 1))
         |                    // (n_total // 10) + 1 END AS decile,
         |        n_toks
         |      FROM r)
         |SELECT CAST(shard AS BIGINT) AS shard, CAST(decile AS BIGINT) AS decile,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens
         |FROM a GROUP BY shard, decile ORDER BY shard, decile""".stripMargin
  )
}
