package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{asDouble, cosineR6, sqlCosineR6}

/** Evaluation / indexing / label-engineering operators (round 9, third
  * wave): the quantization-recall audit every int8 ANN index ships
  * with, day-of-week seasonal indices, a word-bitmap membership index,
  * decile calibration (gain chart), bounded k-core peeling of the dup
  * graph, and a leakage-safe churn label builder.
  *
  * Reference intent: the reference's eval loop is a per-store metric
  * table eyeballed in Streamlit
  * (services/training-service/app/train_utils.py:94-121 computes
  * RMSE/MAPE per walk-forward fold); these operators are the
  * corpus-scale versions
  * of the judgment calls around that loop — is the compressed index
  * still finding the right neighbors, which weekday drives the
  * forecast's seasonality, how well does engagement rank predict
  * conversion, and which users count as churned when the label window
  * must not leak into features.
  */
object EvalQueries {

  /** Label-window cutoff for q184: features strictly before, labels at
    * or after. Events span 2024-01; the final week is the label window. */
  private val ChurnCutoff = "2024-01-24"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G124: int8 quantization recall audit (compressed vs exact) ─────
    // q117 lands the 4×-smaller int8 codes; this measures what that
    // compression costs at query time: top-10 neighbors of query vector
    // 0 under EXACT fp cosine (q26's arm) vs top-10 under the int8
    // codes, overlap counted by semi-join (q69's audit shape). The int8
    // ranking is float-free: score = sign(dot)·(dot²·10¹² div qqa·qqb)
    // over the quantized values — monotone in cos² with the sign
    // restored, DECIMAL(38,0)-exact, so both engines rank identically
    // and the audit itself is oracled. At scale both arms are the same
    // broadcast-scan shape as q26; the audit runs on a sampled query
    // set continuously, exactly like q69.
    "q179_quantization_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val exact = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("ve"))
        .crossJoin(broadcast(e.filter(col("vec_id") === 0)
          .select(asDouble(col("embedding")).as("qe"))))
        .select(col("vec_id"), cosineR6(col("ve"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id")).limit(10)
      val q8 = e
        .select(col("vec_id"),
          expr("transform(cast(embedding as array<double>), x -> cast(round(x * 1000000) as bigint))").as("x6"))
        .withColumn("m6", expr("array_max(transform(x6, v -> abs(v)))"))
        .withColumn("qs", expr(
          """transform(x6, v -> CASE WHEN m6 = 0 THEN 0L
            | ELSE cast(sign(v) as bigint) * ((abs(v) * 254 + m6) div (2 * m6))
            | END)""".stripMargin))
        .select(col("vec_id"), col("qs"),
          expr("aggregate(qs, 0L, (a, b) -> a + b * b)").as("qq"))
      val qv = q8.filter(col("vec_id") === 0)
        .select(col("qs").as("qqs"), col("qq").as("qqq"))
      val approx = q8.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .withColumn("dot", expr(
          "aggregate(zip_with(qs, qqs, (x, y) -> x * y), 0L, (a, b) -> a + b)"))
        .withColumn("score", expr(
          "cast(sign(dot) as decimal(38,0)) * " +
            "((cast(dot as decimal(38,0)) * cast(dot as decimal(38,0)) * 1000000000000) " +
            "div (cast(qq as decimal(38,0)) * cast(qqq as decimal(38,0))))"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
      exact.join(approx.select("vec_id"), Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .withColumn("k", lit(10L))
        .withColumn("recall_e4", expr("hits * 10000 div 10"))
    }),

    // ── G125: day-of-week seasonal index (forecast seasonality audit) ──
    // The reference's Prophet forecaster (services/training-service/
    // app/train_utils.py:24-35) leans on weekly seasonality;
    // this states it as data: per (type, ISO weekday), the ratio of the
    // weekday's mean value to the type's overall mean, as exact e6
    // rationals — (sum_dow·n_total·10⁶) div (n_dow·sum_total), lifted
    // to DECIMAL(38,0), sign-explicit. One map-side (type, dow) cell
    // aggregate; totals re-aggregate FROM the cells (never a second
    // fact scan) and broadcast back over ≤|types|·7 rows.
    "q180_seasonal_index" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"), (weekday(col("ts")) + 1).cast(LongType).as("isodow"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 1000000) as bigint)")).as("sum_v6"))
      val totals = cells.groupBy("event_type")
        .agg(sum("n").as("n_tot"), sum("sum_v6").as("v6_tot"))
      cells.join(broadcast(totals), Seq("event_type"))
        .withColumn("num",
          col("sum_v6").cast(dec) * col("n_tot").cast(dec) * lit(1000000L).cast(dec))
        .withColumn("den", col("n").cast(dec) * col("v6_tot").cast(dec))
        .withColumn("index_e6", expr(
          "cast(case when num < 0 then -(abs(num) div den) else num div den end as bigint)"))
        .select("event_type", "isodow", "n", "sum_v6", "index_e6")
        .orderBy("event_type", "isodow")
    }),

    // ── G126: word-bitmap membership index (bitmap AND audit) ──────────
    // The bitmap-index move OLAP engines use for low-cardinality
    // predicates: one bit per user in word-packed BIGINTs keyed by
    // user_id div 63, one bitmap per predicate value, intersection = popcount of
    // AND — no join, no distinct, just bitwise ops on |users|/64 words.
    // Here: users who clicked AND purchased, counted via bitmaps and
    // audited against the direct distinct-intersect, equality emitted.
    // Build is ONE (slot) aggregate with conditional bit_or — the
    // shuffle carries ≤|users|/64 words per predicate; the audit arm is
    // a per-user two-bit aggregate. At 10⁹ users the bitmap is 125 MB
    // per predicate — the artifact a BI engine keeps hot.
    "q181_bitmap_index" -> ((s, dir) => {
      val u = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("user_id")).distinct()
      // 63-bit words: bit 63 would be the sign bit, and DuckDB's checked
      // shift rejects 1<<63 — packing 63 users per word keeps every mask
      // positive in both engines at the cost of 1.6% density
      val words = u
        .withColumn("slot", expr("user_id div 63"))
        .withColumn("bit", expr("shiftleft(1L, cast(user_id % 63 as int))"))
        .groupBy("slot")
        .agg(
          expr("bit_or(if(event_type = 'click', bit, 0L))").as("wc"),
          expr("bit_or(if(event_type = 'purchase', bit, 0L))").as("wp"))
      val viaBitmap = words
        .agg(sum(expr("bit_count(wc & wp)")).cast(LongType).as("n_bitmap"))
      val direct = u.groupBy("user_id")
        .agg(count(lit(1)).as("k")).filter(col("k") === 2)
        .agg(count(lit(1)).as("n_direct"))
      viaBitmap.crossJoin(direct)
        .withColumn("consistent", col("n_bitmap") === col("n_direct"))
    }),

    // ── G127: decile calibration / gain chart (ranking-quality audit) ──
    // Does engagement rank predict conversion? Users bucketed by click
    // count into exact NTILE(10) deciles under the deterministic
    // (clicks desc, user_id) total order. User grain is corpus-scale,
    // so the bucketing is Relational.distributedNtile (range-repartition
    // + partition-major contiguous ids + the exact NTILE size formula),
    // NOT `ntile() OVER (ORDER BY …)` — that unpartitioned window would
    // funnel every user through ONE task. Bit-identical output, every
    // stage parallel. Then per decile: conversion rate and lift vs the
    // base rate, both exact e4 rationals. The gain chart every targeting
    // model is judged by, stated as a query.
    "q182_decile_calibration" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val u = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      val ranked = graft.ops.Relational.distributedNtile(u,
          Seq(col("clicks").desc, col("user_id").asc), 10,
          u.agg(count(lit(1)).as("n_total")), "decile")
        .withColumn("decile", col("decile").cast(LongType))
      val cells = ranked.groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_converted"))
      val tot = cells.agg(sum("n_users").as("u_tot"), sum("n_converted").as("c_tot"))
      cells.crossJoin(broadcast(tot))
        .withColumn("conv_e4", expr("n_converted * 10000 div n_users"))
        .withColumn("lift_e4", expr(
          "cast((cast(n_converted as decimal(38,0)) * u_tot * 10000) div " +
            "(cast(n_users as decimal(38,0)) * c_tot) as bigint)"))
        .select("decile", "n_users", "n_converted", "conv_e4", "lift_e4")
        .orderBy("decile")
    }),

    // ── G128: bounded k-core peeling (dup-graph density skeleton) ──────
    // The 2-core of the near-dup graph — strip degree-<2 nodes, repeat —
    // separates isolated dup pairs from dense template clusters; core
    // membership is the standard "is this a community or a coincidence"
    // signal. Peeling to a fixed point is data-dependent; THREE rounds
    // are unrolled (the q150 PageRank discipline) and the per-round
    // node/edge census shows whether it converged (last two rounds
    // equal). Each round = one endpoint-union degree aggregate + two
    // semi-joins — all equi-joins on doc ids, partitioning reused
    // round to round. Rides the landed q23 pair snapshot, and the peel
    // rounds themselves land once per (JVM, sfDir) — WITHOUT that, each
    // round-i census re-derives the whole peel chain from scratch
    // (Spark shares no common subplans across a DAG), turning 3 rounds
    // into ~2× the work; a real pipeline lands the core decomposition
    // beside the cluster table (componentsTable discipline).
    "q183_kcore_peel" -> ((s, dir) => {
      val init = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      def census(e: DataFrame, round: Int): DataFrame = {
        val nodes = e.select(col("doc_a").as("id"))
          .unionByName(e.select(col("doc_b").as("id"))).distinct()
        nodes.agg(count(lit(1)).as("n_nodes")).crossJoin(
          e.agg(count(lit(1)).as("n_edges")))
          .withColumn("round", lit(round.toLong))
      }
      def peel(e: DataFrame): DataFrame = {
        val keep = e.select(col("doc_a").as("id"))
          .unionByName(e.select(col("doc_b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2)
          .select("id")
        e.join(keep.withColumnRenamed("id", "doc_a"), Seq("doc_a"), "left_semi")
          .join(keep.withColumnRenamed("id", "doc_b"), Seq("doc_b"), "left_semi")
      }
      val work = PipelineQueries.cachedFixture(s"kcore|$dir") { work =>
        val e1 = peel(init)
        e1.write.mode("overwrite").parquet(s"$work/e1")
        val e2 = peel(s.read.parquet(s"$work/e1"))
        e2.write.mode("overwrite").parquet(s"$work/e2")
        peel(s.read.parquet(s"$work/e2"))
          .write.mode("overwrite").parquet(s"$work/e3")
      }
      census(init, 0)
        .unionByName(census(s.read.parquet(s"$work/e1"), 1))
        .unionByName(census(s.read.parquet(s"$work/e2"), 2))
        .unionByName(census(s.read.parquet(s"$work/e3"), 3))
        .select("round", "n_nodes", "n_edges")
        .orderBy("round")
    }),

    // ── G129: leakage-safe churn label builder ─────────────────────────
    // The label-engineering step every churn model starts from, with
    // the discipline that makes it valid: features come STRICTLY from
    // before the cutoff, the label (no activity at-or-after) strictly
    // from after — disjoint windows, no leakage, both from ONE
    // conditional-aggregate pass per user. Users with zero
    // feature-window activity are excluded (nothing to predict from).
    // Output: per log₂ activity bucket (q162's float-free trick), user
    // count and churn rate — the base-rate table a model's lift is
    // judged against. One user_id shuffle, ≤64 output rows at any
    // scale.
    "q184_churn_label" -> ((s, dir) => {
      val cut = lit(ChurnCutoff).cast(DateType)
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          sum(when(to_date(col("ts")) < cut, 1L).otherwise(0L)).as("n_feat"),
          max(when(to_date(col("ts")) >= cut, 1L).otherwise(0L)).as("active_after"))
        .filter(col("n_feat") > 0)
        .withColumn("bucket", (length(bin(col("n_feat"))) - 1).cast(LongType))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_users"),
          sum(lit(1L) - col("active_after")).as("n_churned"))
        .withColumn("churn_e4", expr("n_churned * 10000 div n_users"))
        .orderBy("bucket")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q179_quantization_recall" -> {
      val cosR6 = sqlCosineR6("ve", "qe")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings WHERE vec_id != 0),
         |exact AS (SELECT vec_id, $cosR6 AS cos_r
         |          FROM e, q ORDER BY cos_r DESC, vec_id LIMIT 10),
         |x AS (SELECT vec_id,
         |        list_transform(CAST(embedding AS DOUBLE[]),
         |          v -> CAST(round(v * 1000000) AS BIGINT)) AS x6
         |      FROM embeddings),
         |m AS (SELECT vec_id, x6,
         |        list_max(list_transform(x6, v -> abs(v))) AS m6 FROM x),
         |c AS (SELECT vec_id,
         |        list_transform(x6, v -> CASE WHEN m6 = 0 THEN 0
         |          ELSE CAST(sign(v) AS BIGINT) * ((abs(v) * 254 + m6) // (2 * m6))
         |          END) AS qs
         |      FROM m),
         |w AS (SELECT vec_id, qs,
         |        CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS qq
         |      FROM c),
         |qv AS (SELECT qs AS qqs, qq AS qqq FROM w WHERE vec_id = 0),
         |d AS (SELECT vec_id, qq, qqq,
         |        CAST(list_sum(list_transform(range(1, len(qs) + 1),
         |          i -> qs[i] * qqs[i])) AS BIGINT) AS dot
         |      FROM w, qv WHERE vec_id != 0),
         |sc AS (SELECT vec_id,
         |         CAST(sign(dot) AS HUGEINT) *
         |           ((CAST(dot AS HUGEINT) * dot * 1000000000000) //
         |            (CAST(qq AS HUGEINT) * qqq)) AS score
         |       FROM d),
         |approx AS (SELECT vec_id FROM sc ORDER BY score DESC, vec_id LIMIT 10)
         |SELECT COUNT(*) AS hits, CAST(10 AS BIGINT) AS k,
         |       CAST(COUNT(*) * 10000 // 10 AS BIGINT) AS recall_e4
         |FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)""".stripMargin
    },

    "q180_seasonal_index" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_v6
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_tot,
        |          CAST(SUM(sum_v6) AS BIGINT) AS v6_tot
        |        FROM cells GROUP BY 1),
        |j AS (SELECT c.event_type, c.isodow, c.n, c.sum_v6,
        |        CAST(c.sum_v6 AS HUGEINT) * t.n_tot * 1000000 AS num,
        |        CAST(c.n AS HUGEINT) * t.v6_tot AS den
        |      FROM cells c JOIN tot t ON t.event_type = c.event_type)
        |SELECT event_type, isodow, n, sum_v6,
        |       CAST(CASE WHEN num < 0 THEN -(ABS(num) // den)
        |                 ELSE num // den END AS BIGINT) AS index_e6
        |FROM j ORDER BY event_type, isodow""".stripMargin,

    "q181_bitmap_index" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events
        |           WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT user_id // 63 AS slot,
        |        bit_or(CASE WHEN event_type = 'click'
        |                    THEN (1::BIGINT << CAST(user_id % 63 AS INT)) ELSE 0 END) AS wc,
        |        bit_or(CASE WHEN event_type = 'purchase'
        |                    THEN (1::BIGINT << CAST(user_id % 63 AS INT)) ELSE 0 END) AS wp
        |      FROM u GROUP BY 1),
        |b AS (SELECT CAST(SUM(bit_count(wc & wp)) AS BIGINT) AS n_bitmap FROM w),
        |d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_direct FROM (
        |        SELECT user_id FROM u GROUP BY user_id HAVING COUNT(*) = 2))
        |SELECT n_bitmap, n_direct, n_bitmap = n_direct AS consistent
        |FROM b, d""".stripMargin,

    "q182_decile_calibration" ->
      """WITH u AS (SELECT user_id,
        |             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
        |             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |           FROM events GROUP BY user_id),
        |r AS (SELECT clicks, converted,
        |        CAST(NTILE(10) OVER (ORDER BY clicks DESC, user_id) AS BIGINT) AS decile
        |      FROM u),
        |cells AS (SELECT decile, COUNT(*) AS n_users,
        |            CAST(SUM(converted) AS BIGINT) AS n_converted
        |          FROM r GROUP BY decile),
        |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS u_tot,
        |          CAST(SUM(n_converted) AS BIGINT) AS c_tot FROM cells)
        |SELECT decile, n_users, n_converted,
        |       CAST(n_converted * 10000 // n_users AS BIGINT) AS conv_e4,
        |       CAST((CAST(n_converted AS HUGEINT) * u_tot * 10000) //
        |            (CAST(n_users AS HUGEINT) * c_tot) AS BIGINT) AS lift_e4
        |FROM cells, tot ORDER BY decile""".stripMargin,

    "q183_kcore_peel" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM ($q23)),
         |d1 AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM (
         |         SELECT doc_a AS id FROM e0 UNION ALL SELECT doc_b FROM e0)
         |       GROUP BY id),
         |k1 AS MATERIALIZED (SELECT id FROM d1 WHERE deg >= 2),
         |e1 AS MATERIALIZED (SELECT doc_a, doc_b FROM e0
         |       WHERE doc_a IN (SELECT id FROM k1) AND doc_b IN (SELECT id FROM k1)),
         |d2 AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM (
         |         SELECT doc_a AS id FROM e1 UNION ALL SELECT doc_b FROM e1)
         |       GROUP BY id),
         |k2 AS MATERIALIZED (SELECT id FROM d2 WHERE deg >= 2),
         |e2 AS MATERIALIZED (SELECT doc_a, doc_b FROM e1
         |       WHERE doc_a IN (SELECT id FROM k2) AND doc_b IN (SELECT id FROM k2)),
         |d3 AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM (
         |         SELECT doc_a AS id FROM e2 UNION ALL SELECT doc_b FROM e2)
         |       GROUP BY id),
         |k3 AS MATERIALIZED (SELECT id FROM d3 WHERE deg >= 2),
         |e3 AS MATERIALIZED (SELECT doc_a, doc_b FROM e2
         |       WHERE doc_a IN (SELECT id FROM k3) AND doc_b IN (SELECT id FROM k3))
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS round,
         |         (SELECT COUNT(DISTINCT id) FROM (SELECT doc_a AS id FROM e0
         |            UNION ALL SELECT doc_b FROM e0)) AS n_nodes,
         |         (SELECT COUNT(*) FROM e0) AS n_edges
         |  UNION ALL SELECT 1,
         |         (SELECT COUNT(DISTINCT id) FROM (SELECT doc_a AS id FROM e1
         |            UNION ALL SELECT doc_b FROM e1)),
         |         (SELECT COUNT(*) FROM e1)
         |  UNION ALL SELECT 2,
         |         (SELECT COUNT(DISTINCT id) FROM (SELECT doc_a AS id FROM e2
         |            UNION ALL SELECT doc_b FROM e2)),
         |         (SELECT COUNT(*) FROM e2)
         |  UNION ALL SELECT 3,
         |         (SELECT COUNT(DISTINCT id) FROM (SELECT doc_a AS id FROM e3
         |            UNION ALL SELECT doc_b FROM e3)),
         |         (SELECT COUNT(*) FROM e3))
         |ORDER BY round""".stripMargin
    },

    "q184_churn_label" ->
      s"""WITH u AS (SELECT user_id,
         |             SUM(CASE WHEN CAST(ts AS DATE) < DATE '$ChurnCutoff'
         |                      THEN 1 ELSE 0 END) AS n_feat,
         |             MAX(CASE WHEN CAST(ts AS DATE) >= DATE '$ChurnCutoff'
         |                      THEN 1 ELSE 0 END) AS active_after
         |           FROM events GROUP BY user_id),
         |b AS (SELECT CAST(length(bin(n_feat)) - 1 AS BIGINT) AS bucket,
         |        active_after
         |      FROM u WHERE n_feat > 0)
         |SELECT bucket, COUNT(*) AS n_users,
         |       CAST(SUM(1 - active_after) AS BIGINT) AS n_churned,
         |       CAST(SUM(1 - active_after) * 10000 // COUNT(*) AS BIGINT) AS churn_e4
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
