package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-preparation operators (round 9, eighteenth wave): identity-key
  * normalization, exact k-NN voting, supervised feature-matrix
  * materialization, and quantile normalization.
  *
  * Reference intent: the reference's features are whatever columns the
  * Kafka message carried (services/airflow/dags/spark_streaming
  * .py:60-66); a production training pipeline canonicalizes join keys
  * first, assembles lag/rolling feature matrices with their labels in
  * one pass, and normalizes distributions across groups before any
  * model sees them. All exact-integer, DuckDB-gated.
  */
object PrepQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G189: identity-key normalization (email canonicalization) ──────
    // The entity-resolution step before any identity join: lowercase,
    // strip +tags and local-part dots (the gmail convention —
    // documented policy, not universal truth), unify domain case. The
    // fixture derives adversarial raw emails deterministically from
    // user ids (mixed case, +tags, dotted locals, three domain
    // spellings); the ledger counts raw identities vs canonical ones
    // per canonical domain — the dedup win the normalization buys.
    // Pure codegen string expressions in the scan projection; the
    // distinct is the only shuffle.
    "q244_email_normalize" -> ((s, dir) => {
      val raw = Tables.events(s, dir).select(col("user_id"))
        .withColumn("email", expr(
          """concat('User.', cast(user_id as string),
            |       case when user_id % 2 = 0 then concat('+tag', cast(user_id % 7 as string)) else '' end,
            |       '@',
            |       element_at(array('Example.COM', 'MAIL.example.com', 'example.com'),
            |                  cast(user_id % 3 as int) + 1))""".stripMargin))
      raw
        .withColumn("local", expr("substring_index(email, '@', 1)"))
        .withColumn("domain", expr("lower(substring_index(email, '@', -1))"))
        .withColumn("canonical", expr(
          "concat(lower(replace(regexp_replace(local, '\\\\+.*$', ''), '.', '')), '@', domain)"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("email")).as("n_raw_ids"),
          countDistinct(col("canonical")).as("n_canonical"))
        .withColumn("collapse_e4", expr("(n_raw_ids - n_canonical) * 10000 div n_raw_ids"))
        .orderBy("domain")
    }),

    // ── G190: exact k-NN majority vote (k=5 classification audit) ──────
    // The instance-based counterpart of q235's centroids: for 50
    // hash-picked probe vectors, the 5 nearest neighbors by exact
    // integer L2 (self excluded) vote on the label; ties break toward
    // the smaller label (deterministic). Probe×corpus is the bounded
    // join — 50 probes however big the corpus, and at 10⁹ vectors the
    // same plan rides q28/q38's LSH/IVF candidates instead of the full
    // cross. Emits the per-probe verdict ledger.
    "q245_knn_classify" -> ((s, dir) => {
      // spread: the ×64 coordinate posexplode feeding the probe join
      // otherwise runs inside the single-row-group scan's one task
      val x = graft.ops.Relational.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          posexplode(graft.functions.VectorFunctions.asDouble(col("embedding")))
            .as(Seq("p", "e")))
        .select(col("vec_id"), col("label"), col("p"),
          round(col("e") * 1000000).cast(LongType).as("v6"))
      val probes = x.filter(
        expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 4), 16, 10) as bigint) % 40 = 0"))
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("p"), col("v6").as("q6"))
      val d2 = probes.join(x.withColumnRenamed("vec_id", "n_id")
            .withColumnRenamed("label", "n_label"), Seq("p"))
        .filter(col("q_id") =!= col("n_id"))
        .groupBy("q_id", "q_label", "n_id", "n_label")
        .agg(sum(expr("(q6 - v6) * (q6 - v6)")).as("d2"))
      val w = Window.partitionBy("q_id").orderBy(col("d2").asc, col("n_id").asc)
      d2.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .groupBy("q_id", "q_label", "n_label").agg(count(lit(1)).as("votes"))
        .groupBy("q_id", "q_label")
        .agg(max_by(col("n_label"), struct(col("votes"), -col("n_label"))).as("pred"))
        .withColumn("correct", col("pred") === col("q_label"))
        .orderBy("q_id")
    }),

    // ── G191: supervised feature-matrix materialization ────────────────
    // The training-table build: per (type, day) the target's lag-1,
    // lag-7, trailing-7 mean, AND the supervised label (lead-1) — four
    // frames on ONE (type, day)-sorted exchange, full windows only, so
    // every emitted row is a complete training example. This is the
    // job that feeds q236's fits; label leakage is structurally
    // impossible because the label is the only lead and everything
    // else is strictly backward-looking.
    "q246_feature_matrix" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val w7 = wo.rowsBetween(-6, 0)
      daily
        .withColumn("lag1_y6", lag("y6", 1).over(wo))
        .withColumn("lag7_y6", lag("y6", 7).over(wo))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("ma7_y6", expr("sum(y6) over (partition by event_type order by day rows between 6 preceding and current row) div 7"))
        .withColumn("label_y6", lead("y6", 1).over(wo))
        .filter(col("lag7_y6").isNotNull && col("label_y6").isNotNull && col("n7") === 7)
        .select("event_type", "day", "y6", "lag1_y6", "lag7_y6", "ma7_y6", "label_y6")
        .orderBy("event_type", "day")
    }),

    // ── G192: quantile normalization across groups ─────────────────────
    // Make every type's daily-revenue distribution comparable: replace
    // each value by the cross-type MEAN of its rank's values (the
    // bioinformatics quantile-normalization recipe, exact with floor
    // division). Rank within type (value, day tiebreak), reference =
    // per-rank mean across types, map back by rank join. Two window
    // passes + one rank-grain aggregate — the rank table is
    // |days|-sized, broadcast back.
    "q247_quantile_normalize" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("y6"))
      val ranked = daily.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("y6").asc, col("day").asc)))
      val ref = ranked.groupBy("rk")
        .agg(expr("sum(y6) div count(1)").as("ref_y6"), count(lit(1)).as("n_types"))
      ranked.join(broadcast(ref), "rk")
        .select(col("event_type"), col("day"), col("y6"), col("rk").cast(LongType).as("rk"),
          col("ref_y6"), col("n_types"))
        .orderBy("event_type", "day")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q244_email_normalize" ->
      """WITH raw AS (SELECT user_id,
        |    'User.' || CAST(user_id AS VARCHAR) ||
        |    (CASE WHEN user_id % 2 = 0 THEN '+tag' || CAST(user_id % 7 AS VARCHAR) ELSE '' END) ||
        |    '@' ||
        |    (['Example.COM', 'MAIL.example.com', 'example.com'])[CAST(user_id % 3 AS INT) + 1]
        |      AS email
        |  FROM events),
        |n AS (SELECT email,
        |        lower(substr(email, 1 + strpos(email, '@'))) AS domain,
        |        lower(replace(regexp_replace(split_part(email, '@', 1), '\+.*$', ''),
        |          '.', '')) || '@' ||
        |          lower(substr(email, 1 + strpos(email, '@'))) AS canonical
        |      FROM raw)
        |SELECT domain, COUNT(*) AS n_rows,
        |       CAST(COUNT(DISTINCT email) AS BIGINT) AS n_raw_ids,
        |       CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
        |       CAST((COUNT(DISTINCT email) - COUNT(DISTINCT canonical)) * 10000
        |            // COUNT(DISTINCT email) AS BIGINT) AS collapse_e4
        |FROM n GROUP BY domain ORDER BY domain""".stripMargin,

    "q245_knn_classify" ->
      """WITH x AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             generate_subscripts(embedding, 1) AS p,
        |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v6
        |           FROM embeddings),
        |probes AS (SELECT vec_id AS q_id, label AS q_label, p, v6 AS q6 FROM x
        |           WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)
        |                   AS BIGINT) % 40 = 0),
        |d AS (SELECT pr.q_id, pr.q_label, x.vec_id AS n_id, x.label AS n_label,
        |        SUM((pr.q6 - x.v6) * (pr.q6 - x.v6)) AS d2
        |      FROM probes pr JOIN x USING (p)
        |      WHERE pr.q_id != x.vec_id
        |      GROUP BY 1, 2, 3, 4),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY d2, n_id) AS rk FROM d),
        |v AS (SELECT q_id, q_label, n_label, COUNT(*) AS votes
        |      FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
        |p2 AS (SELECT q_id, q_label, n_label AS pred,
        |         ROW_NUMBER() OVER (PARTITION BY q_id
        |           ORDER BY votes DESC, n_label ASC) AS vr
        |       FROM v)
        |SELECT q_id, q_label, pred, pred = q_label AS correct
        |FROM p2 WHERE vr = 1 ORDER BY q_id""".stripMargin,

    "q246_feature_matrix" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 SUM(CAST(round(value * 1000000) AS BIGINT)) AS y6
        |               FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, day, y6,
        |        LAG(y6, 1) OVER wo AS lag1_y6,
        |        LAG(y6, 7) OVER wo AS lag7_y6,
        |        COUNT(*) OVER w7 AS n7,
        |        SUM(y6) OVER w7 // 7 AS ma7_y6,
        |        LEAD(y6, 1) OVER wo AS label_y6
        |      FROM daily
        |      WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |             w7 AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, CAST(y6 AS BIGINT) AS y6,
        |       CAST(lag1_y6 AS BIGINT) AS lag1_y6, CAST(lag7_y6 AS BIGINT) AS lag7_y6,
        |       CAST(ma7_y6 AS BIGINT) AS ma7_y6, CAST(label_y6 AS BIGINT) AS label_y6
        |FROM m WHERE lag7_y6 IS NOT NULL AND label_y6 IS NOT NULL AND n7 = 7
        |ORDER BY event_type, day""".stripMargin,

    "q247_quantile_normalize" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                 SUM(CAST(round(value * 1000000) AS BIGINT)) AS y6
        |               FROM events GROUP BY 1, 2),
        |ranked AS (SELECT event_type, day, CAST(y6 AS BIGINT) AS y6,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |               ORDER BY y6, day) AS BIGINT) AS rk
        |           FROM daily),
        |ref AS (SELECT rk, CAST(SUM(y6) // COUNT(*) AS BIGINT) AS ref_y6,
        |          COUNT(*) AS n_types
        |        FROM ranked GROUP BY rk)
        |SELECT r.event_type, r.day, r.y6, r.rk, ref.ref_y6,
        |       CAST(ref.n_types AS BIGINT) AS n_types
        |FROM ranked r JOIN ref USING (rk)
        |ORDER BY r.event_type, r.day""".stripMargin
  )
}
