package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational.boundedGlobalRank

/** Robustness / compression / pattern operators (round 9, fifth wave):
  * the salted replicated join that survives power-law keys, malformed-
  * record CSV ingest accounting, product quantization (the
  * billion-vector ANN compression standard), a tokenizer-vocabulary
  * coverage curve, and MATCH_RECOGNIZE-lite event-pattern counting.
  *
  * Reference intent: the reference ingests one well-formed CSV and one
  * Kafka topic and never meets a skewed join, a corrupt row, or a
  * vector index bigger than RAM (services/data-producer,
  * spark_streaming.py). Each operator here is the move a 100-TB
  * deployment of the same pipeline eventually makes, stated as an
  * oracle-gated query with the house disciplines: deterministic
  * corruption fixtures, scaled-BIGINT arithmetic, candidate bounding,
  * map-side-combining aggregates.
  */
object RobustQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G135: salted replicated join (power-law-proof equi-join) ───────
    // events joins its 5-key type dimension — the worst-case skew shape
    // where one reducer owns a fifth of the corpus. The salted form:
    // fact rows pick a deterministic salt (md5(event_id) % 8), the dim
    // replicates ×8 (one copy per salt), and the join key becomes
    // (type, salt) — every hot key spreads over 8 reducers, result
    // EXACTLY the unsalted join (the oracle runs the plain form; q47's
    // two-phase-aggregation rule applied to joins). Here the tiny dim
    // also broadcasts, collapsing the demo to a map-side join — the
    // pattern matters when the dim is too big to broadcast and AQE's
    // skew splitting can't see a join that hasn't run yet.
    "q190_salted_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"),
          expr("cast(conv(substring(md5(cast(event_id as string)), 1, 4), 16, 10) as int) % 8")
            .as("salt"))
      val dim = e.groupBy("event_type")
        .agg(sum("v6").as("sv"), count(lit(1)).as("cn"))
        .select(col("event_type"), expr("sv div cn").as("mean_v6"))
      val dimSalted = dim.crossJoin(
        s.range(8).select(col("id").cast(IntegerType).as("salt")))
      e.join(dimSalted, Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v6") > col("mean_v6"), 1L).otherwise(0L)).as("n_above_mean"),
          min("mean_v6").as("mean_v6"))
        .orderBy("event_type")
    }),

    // ── G136: malformed-record CSV ingest accounting (PERMISSIVE) ──────
    // Real CSV feeds carry garbage rows; a pipeline must COUNT what it
    // dropped, not crash (FAILFAST) or silently null it. The fixture
    // lands the q33 order feed with a deterministic corruption rule
    // (orderkey % 97 = 0 ⇒ TotalPrice = 'N/A'); the PERMISSIVE read
    // with an explicit schema + columnNameOfCorruptRecord turns each
    // bad row into (nulls, raw-line) — per-status good/corrupt counts
    // are the ingest-quality ledger. The oracle re-derives both counts
    // from the orders table and the same rule, so the accounting
    // itself is hash-gated. Schema-on-read, splittable multi-file
    // layout, no driver-side parsing — the at-scale CSV shape.
    "q191_csv_malformed" -> ((s, dir) => {
      val src = PipelineQueries.cachedFixture(s"badcsv|$dir") { work =>
        Tables.orders(s, dir).select(
            col("o_orderkey").as("OrderKey"),
            col("o_orderstatus").as("Status"),
            when(col("o_orderkey") % 97 === 0, lit("N/A"))
              .otherwise(format_string("%.2f", col("o_totalprice"))).as("TotalPrice"))
          .repartition(8)
          .write.option("header", "true").mode("overwrite").csv(s"$work/src")
      } + "/src"
      val raw = s.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema(StructType(Seq(
          StructField("OrderKey", LongType),
          StructField("Status", StringType),
          StructField("TotalPrice", DoubleType),
          StructField("_bad", StringType))))
        .csv(src)
      raw
        .withColumn("status", coalesce(col("Status"),
          // corrupt rows still carry the raw line; status is field 2
          split(col("_bad"), ",").getItem(1)))
        .groupBy("status")
        // n_priced references the numeric column on purpose: CSV column
        // pruning (spark.sql.csv.parser.columnPruning) skips parsing
        // unreferenced fields, and an unparsed field can never flag the
        // row corrupt — an audit that doesn't read the column it audits
        // silently reports zero corruption
        .agg(sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          count(col("TotalPrice")).as("n_priced"))
        .orderBy("status")
    }),

    // ── G137: product quantization (PQ codebook assignment + SSE) ──────
    // THE billion-vector compression: split d=64 dims into 8 blocks of
    // 8, quantize each block to its nearest of 8 codebook entries
    // (seed vectors 0..7's sub-blocks — the q38/q132 deterministic-seed
    // discipline), so a vector stores 8 bytes instead of 256. Exact
    // e6-int squared-L2 per block (diffs ≤ 4e6 ⇒ block d² ≤ 1.3e14,
    // BIGINT-safe), ties → lowest code. Output: per (block, code) the
    // assignment census + summed quantization error — the codebook-
    // health table a PQ index monitors for retraining. Plan: seeds
    // broadcast into the per-block explode, assignment collapses
    // map-side to |vecs|·8 rows, the 64-key census partial-aggregates.
    "q192_product_quantization" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("transform(cast(embedding as array<double>), x -> cast(round(x * 1000000) as bigint))").as("x6"))
        .select(col("vec_id"), explode(expr(
          "transform(sequence(0, 7), b -> struct(b, slice(x6, b * 8 + 1, 8) as xb))")).as("t"))
        .select(col("vec_id"), col("t.b").as("b"), col("t.xb").as("xb"))
      val seeds = x.filter(col("vec_id") < 8)
        .select(col("vec_id").cast(IntegerType).as("code"), col("b"), col("xb").as("sb"))
      val d2 = x.join(broadcast(seeds), Seq("b"))
        .withColumn("d2", expr(
          "aggregate(zip_with(xb, sb, (p, q) -> (p - q) * (p - q)), 0L, (a, v) -> a + v)"))
      d2.groupBy("vec_id", "b")
        .agg(min_by(struct(col("code"), col("d2")), struct(col("d2"), col("code"))).as("m"))
        .select(col("vec_id"), col("b"), col("m.code").as("code"), col("m.d2").as("d2"))
        .groupBy("b", "code")
        .agg(count(lit(1)).as("n_vecs"), sum(col("d2").cast(dec)).as("sse_e12"))
        .orderBy("b", "code")
    }),

    // ── G138: tokenizer-vocabulary coverage curve (OOV sizing) ─────────
    // How big must the vocab be? For V ∈ {5, 10, 20, 30} (this synthetic
    // corpus draws from a 31-token vocabulary; real cutpoints are 2ᵏ·1000
    // — same plan either way): the share of
    // ALL token occurrences covered by the top-V tokens (by total
    // frequency, ties by token) — the curve that sizes a tokenizer or
    // a stopword table before training. One corpus-scale (tok) count
    // aggregate; everything after runs on the |vocab| table (rank
    // window over the VOCABULARY — q144's rule — then 4 cut lookups).
    "q193_vocab_coverage" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      // only ranks ≤ 30 are read, and cum at rank k is the sum of the
      // top-k rows — so TakeOrdered the top 30 FIRST and run the rank +
      // prefix-sum windows over those 30 survivors, never an
      // unpartitioned window over the full vocabulary table.
      val ranked = tf
        .orderBy(col("tf").desc, col("tok")).limit(30)
        .withColumn("rnk", row_number().over(boundedGlobalRank(col("tf").desc, col("tok"))))
        .withColumn("cum", sum("tf").over(
          boundedGlobalRank(col("tf").desc, col("tok"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = tf.agg(sum("tf").as("total"), count(lit(1)).as("n_vocab"))
      ranked.filter(col("rnk").isin(5, 10, 20, 30))
        .crossJoin(broadcast(tot))
        .select(col("rnk").cast(LongType).as("vocab_size"),
          col("cum").as("covered"), col("total"), col("n_vocab"),
          expr("cum * 1000000 div total").as("coverage_e6"))
        .orderBy("vocab_size")
    }),

    // ── G139: event-pattern counting (MATCH_RECOGNIZE-lite) ────────────
    // "click followed by an error within the next 2 events of the same
    // user" — the sequential pattern an alerting rule or a UX funnel
    // states, answered with two lead() windows on ONE per-user sort
    // exchange (no self-join, no per-row subquery). Each match reports
    // its gap (1 = immediately next, 2 = one event between); instances
    // where both gaps match count once per gap. Output: gap, matches,
    // distinct users — ≤2 rows at any corpus size. The k-step
    // generalization adds lead(k) columns on the SAME window.
    "q194_event_pattern" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("t1", lead("event_type", 1).over(w))
        .withColumn("t2", lead("event_type", 2).over(w))
        .filter(col("event_type") === "click")
      val g1 = e.filter(col("t1") === "error")
        .agg(count(lit(1)).as("matches"), countDistinct(col("user_id")).as("n_users"))
        .withColumn("gap", lit(1L))
      val g2 = e.filter(col("t2") === "error")
        .agg(count(lit(1)).as("matches"), countDistinct(col("user_id")).as("n_users"))
        .withColumn("gap", lit(2L))
      g1.unionByName(g2).select("gap", "matches", "n_users").orderBy("gap")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q190_salted_join" ->
      """WITH e AS (SELECT event_type,
        |             CAST(round(value * 1000000) AS BIGINT) AS v6 FROM events),
        |dim AS (SELECT event_type, SUM(v6) // COUNT(*) AS mean_v6
        |        FROM e GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN e.v6 > dim.mean_v6 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_above_mean,
        |       CAST(MIN(dim.mean_v6) AS BIGINT) AS mean_v6
        |FROM e JOIN dim ON dim.event_type = e.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q191_csv_malformed" ->
      """SELECT o_orderstatus AS status,
        |       CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
        |       CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |       CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_priced
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q192_product_quantization" ->
      """WITH x AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |               v -> CAST(round(v * 1000000) AS BIGINT)) AS x6
        |           FROM embeddings),
        |blocks AS (SELECT vec_id, CAST(r.b AS BIGINT) AS b,
        |             list_slice(x6, CAST(r.b * 8 + 1 AS INT),
        |                        CAST(r.b * 8 + 8 AS INT)) AS xb
        |           FROM x CROSS JOIN range(8) r(b)),
        |seeds AS (SELECT CAST(vec_id AS INT) AS code, b, xb AS sb
        |          FROM blocks WHERE vec_id < 8),
        |d AS (SELECT bl.vec_id, bl.b, s.code,
        |        list_sum(list_transform(range(1, 9),
        |          i -> (bl.xb[i] - s.sb[i]) * (bl.xb[i] - s.sb[i]))) AS d2
        |      FROM blocks bl JOIN seeds s ON s.b = bl.b),
        |asg AS (SELECT vec_id, b, code, d2,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id, b
        |            ORDER BY d2, code) AS rn
        |        FROM d)
        |SELECT b, code, COUNT(*) AS n_vecs,
        |       SUM(CAST(d2 AS HUGEINT)) AS sse_e12
        |FROM asg WHERE rn = 1
        |GROUP BY b, code ORDER BY b, code""".stripMargin,

    "q193_vocab_coverage" -> {
      val toks = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH t AS (SELECT unnest($toks) AS tok FROM documents),
         |tf AS (SELECT tok, COUNT(*) AS tf FROM t GROUP BY tok),
         |r AS (SELECT tok, tf,
         |        ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS rnk,
         |        SUM(tf) OVER (ORDER BY tf DESC, tok
         |                      ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM tf),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total,
         |          COUNT(*) AS n_vocab FROM tf)
         |SELECT CAST(rnk AS BIGINT) AS vocab_size,
         |       CAST(cum AS BIGINT) AS covered, total, n_vocab,
         |       CAST(CAST(cum AS HUGEINT) * 1000000 // total AS BIGINT)
         |         AS coverage_e6
         |FROM r, tot WHERE rnk IN (5, 10, 20, 30)
         |ORDER BY vocab_size""".stripMargin
    },

    "q194_event_pattern" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |l AS (SELECT user_id, event_type,
        |        LEAD(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS t1,
        |        LEAD(event_type, 2) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS t2
        |      FROM e),
        |c AS (SELECT * FROM l WHERE event_type = 'click')
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS gap, COUNT(*) AS matches,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM c WHERE t1 = 'error'
        |  UNION ALL
        |  SELECT 2, COUNT(*), COUNT(DISTINCT user_id)
        |  FROM c WHERE t2 = 'error')
        |ORDER BY gap""".stripMargin
  )
}
