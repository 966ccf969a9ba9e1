package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.ops.Relational.boundedGlobalRank

/** Assurance subsystem (round 10, forty-first wave): measured Bloom
  * false-positive rate, schema-rename matching, passage-snippet
  * extraction, and a differentially-private release with deterministic
  * geometric noise.
  *
  * Reference intent: none of these exist in the reference — they are
  * the release gates a 100-TB platform puts between itself and its
  * consumers. q337 measures the FPR economics that size q110's
  * bloom-pruned decontamination join, with a bit-identical integer
  * bloom both engines construct (Spark's own BloomFilterAggregate is
  * xxhash64-internal and oracle-opaque — this one is md5-derived and
  * fully checkable). q338 is the schema-matching step every lake
  * migration runs: match renamed columns across snapshot generations by
  * their stat fingerprints (NDV, nulls, min/max, content checksum),
  * never by name. q339 extracts the best fixed-width passage per
  * matching document — the snippet a retrieval UI shows under each
  * q221 hit. q340 releases a histogram under ε = ln 2 differential
  * privacy with two-sided geometric noise drawn by inverse-CDF from an
  * md5-uniform — the mechanism is real (Ghosh et al.'s geometric
  * mechanism is the discrete Laplace), the determinism makes it
  * oracle-checkable, and the comment documents exactly what a
  * production release would swap (a real entropy source).
  */
object AssuranceQueries {

  /** Two-sided geometric inverse-CDF ladder, p = 1/2: P(0) = 1/3,
    * P(±k) = (1/3)·2^-k. Cumulative e6 literals are design-time
    * constants shared VERBATIM by both engines; the ±6 clamp holds the
    * residual 2.08% tail mass (documented bias, irrelevant to the
    * ε = ln 2 guarantee which the per-step 2× likelihood ratio sets).
    * Plain CASE/comparison text parses identically in Spark SQL and
    * DuckDB. */
  private def geomNoise(u: String): String =
    s"""CASE WHEN ($u) < 333333 THEN 0
       |     WHEN ($u) < 500000 THEN 1  WHEN ($u) < 666667 THEN -1
       |     WHEN ($u) < 750000 THEN 2  WHEN ($u) < 833333 THEN -2
       |     WHEN ($u) < 875000 THEN 3  WHEN ($u) < 916667 THEN -3
       |     WHEN ($u) < 937500 THEN 4  WHEN ($u) < 958333 THEN -4
       |     WHEN ($u) < 968750 THEN 5  WHEN ($u) < 979167 THEN -5
       |     WHEN ($u) < 989584 THEN 6  ELSE -6 END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G282: measured Bloom false-positive rate ───────────────────────
    // A 16384-bit / k=3 integer bloom over a 5% md5-picked build set,
    // words of 32 bits so the shifted literal never overflows either
    // engine. Probing every doc measures the REAL FPR among true
    // non-members — the number that prices q110's bloom-pruned anti
    // join (the maybes fraction that must pay the exact join) — and
    // certifies zero false negatives (every member must probe true).
    // Scale shape: the bloom is ONE aggregate over the build side into
    // 512 words broadcast to probe tasks; the probe is 3 broadcast
    // lookups per key, no shuffle of the corpus.
    "q337_bloom_fpr" -> ((s, dir) => {
      def positions(df: DataFrame) = df
        .withColumn("j", explode(expr("array(1, 2, 3)")))
        .withColumn("pos", expr(
          "cast(conv(substring(md5(concat(cast(doc_id as string), '#', j)), 1, 8), 16, 10) as bigint) % 16384"))
        .withColumn("word_idx", expr("pos div 32"))
        .withColumn("bit", expr("pos % 32"))
      val docs = Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("member", expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) % 20 = 0"))
      val words = positions(docs.filter(col("member")))
        .groupBy("word_idx")
        .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").as("word"))
      val probed = positions(docs)
        .join(broadcast(words), Seq("word_idx"), "left")
        .withColumn("hit", expr("coalesce(word, 0L) & shiftleft(cast(1 as bigint), cast(bit as int)) != 0"))
        .groupBy("doc_id", "member")
        .agg((sum(when(col("hit"), 1L).otherwise(0L)) === 3).as("might"))
      probed.agg(
          sum(when(col("member"), 1L).otherwise(0L)).as("n_build"),
          count(lit(1)).as("n_probe"),
          sum(when(!col("member"), 1L).otherwise(0L)).as("n_nonmembers"),
          sum(when(!col("member") && col("might"), 1L).otherwise(0L)).as("n_fp"),
          sum(when(col("member") && !col("might"), 1L).otherwise(0L)).as("n_false_neg"))
        .select(col("n_build"), col("n_probe"), col("n_nonmembers"), col("n_fp"),
          col("n_false_neg"),
          expr("n_fp * 1000000 div greatest(n_nonmembers, 1)").as("fpr_e6"),
          expr("16384 div greatest(n_build, 1)").as("bits_per_key"))
    }),

    // ── G283: schema-rename matching (stat-fingerprint column map) ─────
    // The new snapshot generation renamed five columns, dropped
    // o_orderstatus and added a constant etl_batch. Both generations'
    // columns are profiled to the same long-format stat vector (NDV,
    // null count, canonical min/max strings, md5_60-xor content
    // checksum — q321's ANALYZE row plus content identity) and matched
    // by FULL VECTOR equality via a full outer join: renames surface as
    // matched pairs with different names, drops/adds as half-null rows.
    // Name-free matching is the only version that survives a real
    // migration; at 1e12 rows every per-column stat is one parallel
    // aggregate in a shared single scan per generation.
    "q338_schema_match" -> ((s, dir) => {
      def profile(df: DataFrame, cols: Seq[String], side: String) = {
        val agg = df.agg(count(lit(1)).as("n"),
          cols.flatMap(c => Seq(
            countDistinct(col(c)).as(s"ndv_$c"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nul_$c"),
            min(col(c)).cast(StringType).as(s"min_$c"),
            max(col(c)).cast(StringType).as(s"max_$c"),
            expr(s"bit_xor(md5_60(cast($c as string)))").as(s"xor_$c"))): _*)
        agg.select(explode(array(cols.map(c => struct(
            lit(c).as(s"${side}_col"), col(s"ndv_$c").as("ndv"),
            col(s"nul_$c").as("n_null"), col(s"min_$c").as("min_str"),
            col(s"max_$c").as("max_str"), col(s"xor_$c").as("xor60"))): _*)).as("e"))
          .select("e.*")
      }
      // spread: each generation's 6-distinct-aggregate Expand (×7 row
      // fan-out) + partial agg otherwise runs inside the single-row-group
      // scan's one task (guide §2.5) — measured 4.5 s + 3.1 s stages
      val base = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("o_totalprice_c"),
          to_date(col("o_orderdate")).as("o_orderdate"))
      val newGen = base
        .select(col("o_orderkey").as("order_id"), col("o_custkey").as("customer_id"),
          col("o_orderpriority").as("priority"), col("o_totalprice_c").as("amount_c"),
          col("o_orderdate").as("created_at"), lit("b-2026-08").as("etl_batch"))
      val oldP = profile(base, Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_totalprice_c", "o_orderdate"), "old")
      val newP = profile(newGen, Seq("order_id", "customer_id", "priority",
        "amount_c", "created_at", "etl_batch"), "new")
      oldP.join(newP, Seq("ndv", "n_null", "min_str", "max_str", "xor60"), "full_outer")
        .select(col("old_col"), col("new_col"), col("ndv"), col("xor60"),
          (col("old_col").isNotNull && col("new_col").isNotNull).as("matched"))
        .orderBy(coalesce(col("old_col"), col("new_col")), col("new_col"))
    }),

    // ── G284: passage-snippet extraction (best fixed window per doc) ───
    // For every doc matching >= 2 query-term hits: the 10-token window
    // with the most hits, ties to the earliest offset (the window may
    // lead with context tokens — the tie rule, not a hit-anchor, picks
    // the start). One posexplode; the sliding count is a RANGE frame
    // per doc (partitioned window), the per-doc argmax a partitioned
    // rank, and the final cut a TakeOrdered top-20 — no global sort,
    // no re-scan of the text per candidate.
    "q339_snippet_extract" -> ((s, dir) => {
      val pos = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("hit", col("tok").isin("spark", "window", "merge"))
      val wHits = Window.partitionBy("doc_id").orderBy("pos").rangeBetween(0, 9)
      val scored = pos
        .withColumn("win_hits", sum(when(col("hit"), 1L).otherwise(0L)).over(wHits))
        .withColumn("tot_hits", sum(when(col("hit"), 1L).otherwise(0L))
          .over(Window.partitionBy("doc_id")))
        .filter(col("tot_hits") >= 2)
      val best = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("win_hits").desc, col("pos").asc)))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("pos").cast(LongType).as("best_pos"),
          col("win_hits").as("best_hits"), col("tot_hits"))
      best.orderBy(col("best_hits").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          boundedGlobalRank(col("best_hits").desc, col("doc_id").asc)).cast(LongType))
        .orderBy("rank")
    }),

    // ── G285: ε = ln 2 differentially-private histogram release ────────
    // True per-priority order counts plus two-sided geometric noise
    // (the discrete Laplace; per-cell sensitivity 1). The noise is
    // drawn by inverse-CDF from an md5-uniform over the CELL NAME — a
    // deterministic stand-in for the entropy source, which is the ONLY
    // thing a production release swaps (the ladder, the clamp and the
    // max(released, 0) post-processing all ship as-is). Released
    // counts are post-processed to >= 0 (post-processing preserves
    // DP). One aggregate over the fact table; the noise is cell-grain.
    "q340_dp_release" -> ((s, dir) => {
      val hist = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("true_n"))
      hist
        .withColumn("u", expr(
          "cast(conv(substring(md5(concat('dp-v1#', o_orderpriority)), 1, 6), 16, 10) as bigint) % 1000000"))
        .withColumn("noise", expr(geomNoise("u")).cast(LongType))
        .select(col("o_orderpriority"), col("true_n"), col("noise"),
          greatest(col("true_n") + col("noise"), lit(0L)).as("released_n"),
          (abs(col("noise")) === 6).as("clamped"),
          lit("eps=ln2").as("mechanism"))
        .orderBy("o_orderpriority")
    })
  )

  private val toksSql = sqlTokens("text")

  def oracleSql: Map[String, String] = Map(

    "q337_bloom_fpr" ->
      """WITH docs AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 20 = 0 AS member
        |  FROM documents),
        |pos AS (SELECT doc_id, member,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || j), 1, 8) AS BIGINT) % 16384 AS pos
        |  FROM docs, (SELECT UNNEST([1, 2, 3]) AS j) js),
        |wrd AS (SELECT pos // 32 AS word_idx,
        |          bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
        |        FROM pos WHERE member GROUP BY 1),
        |pr AS (SELECT doc_id, member,
        |         SUM(CASE WHEN (COALESCE(word, 0) & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))) != 0
        |                  THEN 1 ELSE 0 END) = 3 AS might
        |       FROM pos LEFT JOIN wrd ON pos // 32 = wrd.word_idx
        |       GROUP BY 1, 2)
        |SELECT CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_build,
        |       CAST(COUNT(*) AS BIGINT) AS n_probe,
        |       CAST(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmembers,
        |       CAST(SUM(CASE WHEN NOT member AND might THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
        |       CAST(SUM(CASE WHEN member AND NOT might THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
        |       CAST(SUM(CASE WHEN NOT member AND might THEN 1 ELSE 0 END) * 1000000
        |         // GREATEST(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END), 1) AS BIGINT) AS fpr_e6,
        |       CAST(16384 // GREATEST(SUM(CASE WHEN member THEN 1 ELSE 0 END), 1) AS BIGINT) AS bits_per_key
        |FROM pr""".stripMargin,

    "q338_schema_match" -> {
      def colStats(c: String, expr0: String, side: String, from: String) =
        s"""SELECT '$c' AS ${side}_col, CAST(COUNT(DISTINCT $expr0) AS BIGINT) AS ndv,
           |  CAST(SUM(CASE WHEN $expr0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(MIN($expr0) AS VARCHAR) AS min_str, CAST(MAX($expr0) AS VARCHAR) AS max_str,
           |  bit_xor(CAST('0x' || substr(md5(CAST($expr0 AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60
           |FROM $from""".stripMargin
      val baseFrom =
        """(SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
          |   CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_c,
          |   CAST(o_orderdate AS DATE) AS o_orderdate FROM orders) b""".stripMargin
      val olds = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice_c", "o_orderdate").map(c => colStats(c, c, "old", baseFrom))
      val news = Seq(
        ("order_id", "o_orderkey"), ("customer_id", "o_custkey"),
        ("priority", "o_orderpriority"), ("amount_c", "o_totalprice_c"),
        ("created_at", "o_orderdate"), ("etl_batch", "'b-2026-08'"))
        .map { case (n, e) => colStats(n, e, "new", baseFrom) }
      s"""WITH oldp AS (${olds.mkString("\nUNION ALL\n")}),
         |newp AS (${news.mkString("\nUNION ALL\n")})
         |SELECT old_col, new_col, COALESCE(oldp.ndv, newp.ndv) AS ndv,
         |       COALESCE(oldp.xor60, newp.xor60) AS xor60,
         |       old_col IS NOT NULL AND new_col IS NOT NULL AS matched
         |FROM oldp FULL OUTER JOIN newp
         |  ON oldp.ndv = newp.ndv AND oldp.n_null = newp.n_null
         |  AND oldp.min_str = newp.min_str AND oldp.max_str = newp.max_str
         |  AND oldp.xor60 = newp.xor60
         |ORDER BY COALESCE(old_col, new_col), new_col""".stripMargin
    },

    "q339_snippet_extract" ->
      s"""WITH t AS (SELECT doc_id, UNNEST($toksSql) AS tok,
         |             generate_subscripts($toksSql, 1) - 1 AS pos
         |           FROM documents),
         |h AS (SELECT doc_id, pos, CASE WHEN tok IN ('spark','window','merge')
         |        THEN 1 ELSE 0 END AS hit FROM t),
         |w AS (SELECT doc_id, pos,
         |        SUM(hit) OVER (PARTITION BY doc_id ORDER BY pos
         |          RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING) AS win_hits,
         |        SUM(hit) OVER (PARTITION BY doc_id) AS tot_hits
         |      FROM h),
         |b AS (SELECT doc_id, pos AS best_pos, win_hits AS best_hits, tot_hits,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY win_hits DESC, pos) AS rk
         |      FROM w WHERE tot_hits >= 2)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY best_hits DESC, doc_id) AS BIGINT) AS rank,
         |       doc_id, CAST(best_pos AS BIGINT) AS best_pos,
         |       CAST(best_hits AS BIGINT) AS best_hits, CAST(tot_hits AS BIGINT) AS tot_hits
         |FROM b WHERE rk = 1
         |ORDER BY best_hits DESC, doc_id LIMIT 20""".stripMargin,

    "q340_dp_release" ->
      s"""WITH h AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS true_n
         |           FROM orders GROUP BY 1),
         |n AS (SELECT *, CAST(${geomNoise(
               "CAST('0x' || substr(md5('dp-v1#' || o_orderpriority), 1, 6) AS BIGINT) % 1000000")} AS BIGINT) AS noise
         |      FROM h)
         |SELECT o_orderpriority, true_n, noise,
         |       GREATEST(true_n + noise, 0) AS released_n,
         |       ABS(noise) = 6 AS clamped, 'eps=ln2' AS mechanism
         |FROM n ORDER BY o_orderpriority""".stripMargin
  )
}
