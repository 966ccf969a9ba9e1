package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.ops.Relational.boundedGlobalRank

/** Ranking-evaluation metrics (round 10, twenty-fifth wave): exact ROC
  * AUC via Mann-Whitney midranks, nDCG@10 with shared integer discount
  * literals, Kendall tau-a between two rankers, and rank-biased overlap
  * (RBO) of two top-k lists.
  *
  * Reference intent: the reference evaluates its forecasts with
  * regression error metrics only (services/training-service/app/
  * train_utils.py:116-123 — RMSE over CV folds); it has no ranking or
  * classification evaluation at all. These are the metrics a
  * retrieval/curation pipeline publishes for ranker and classifier
  * quality, stated exactly. House disciplines apply: every irrational
  * constant (1/log2(i+1), (1-p)·p^(d-1)) is a PRE-COMPUTED integer
  * literal shared verbatim by both engines, so no runtime
  * transcendental ever crosses the engine boundary; all sums and
  * divisions are scaled-BIGINT with floor semantics; every ordering
  * carries an id tiebreak.
  */
object RankEvalQueries {

  /** round(1e9 / log2(i+1)) for i = 1..10 — the nDCG discount table. */
  private val discE9 = Seq(1000000000L, 630929754L, 500000000L, 430676558L,
    386852807L, 356207187L, 333333333L, 315464877L, 301029996L, 289064826L)

  /** round((1-0.9)·0.9^(d-1)·1e12) for d = 1..20 — RBO depth weights. */
  private val rboW = Seq(100000000000L, 90000000000L, 81000000000L,
    72900000000L, 65610000000L, 59049000000L, 53144100000L, 47829690000L,
    43046721000L, 38742048900L, 34867844010L, 31381059609L, 28242953648L,
    25418658283L, 22876792455L, 20589113209L, 18530201889L, 16677181700L,
    15009463530L, 13508517177L)

  private val queryTerms = Seq("spark", "join", "window")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G220: exact ROC AUC (Mann-Whitney rank-sum, tie-aware) ─────────
    // Does `value` separate purchases from the other event types? AUC
    // computed exactly from the rank-sum identity with MIDRANKS for
    // ties: group rows by score (|distinct scores| rows — still
    // corpus-shaped, so the cumulative count uses ops/Relational
    // .prefixSum, the two-phase scan, never a global window), then
    // 2·Σ midrank⁺ = Σ_s p_s·(2·below_s + n_s + 1) and
    // AUC = (2·Σ midrank⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻), floored at e6.
    // All-BIGINT at tested scales (sum2mr·1e6 ≲ n²·1e6 stays under 2⁶³
    // through n ≈ 3e6; at corpus row counts beyond that, swap the three
    // final products to DECIMAL(38,0) — the per-score sums themselves
    // stay one long per distinct score). The divisor guard mirrors
    // q266: a single-class input floors to 1 instead of splitting the
    // engines on null-vs-error division semantics.
    "q275_auc_mannwhitney" -> ((s, dir) => {
      val scored = Tables.events(s, dir)
        .select(round(col("value") * 1000000).cast(LongType).as("v6"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val byScore = scored.groupBy("v6")
        .agg(count(lit(1)).as("n_s"), sum("pos").as("p_s"))
      val cum = graft.ops.Relational.prefixSum(
        byScore, Seq(col("v6").asc), "n_s", "cum_n")
      cum.agg(
          sum(expr("p_s * (2 * (cum_n - n_s) + n_s + 1)")).as("sum2mr"),
          sum("p_s").as("npos"), sum(expr("n_s - p_s")).as("nneg"))
        .select(col("npos"), col("nneg"),
          expr("(sum2mr - npos * (npos + 1)) * 1000000 div greatest(2 * npos * nneg, 1)")
            .as("auc_e6"))
    }),

    // ── G221: nDCG@10 (graded relevance, integer discount table) ───────
    // A fixed 3-term query; ranker = total query-term frequency in the
    // doc (qtf), graded relevance = distinct query terms present (0-3).
    // DCG@10 = Σ g_i·disc(i) with disc(i) = round(1e9/log2(i+1)) — a
    // ten-literal broadcast table, identical in both engines, so the
    // only "float" work happened once at design time. Ideal DCG ranks
    // the corpus by grade. Both top-10s are TakeOrdered + post-limit
    // rank (the q221 discipline); corpus work is one token scan.
    "q276_ndcg" -> ((s, dir) => {
      import s.implicits._
      val termsArr = s"array(${queryTerms.map(t => s"'$t'").mkString(",")})"
      val sc = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          expr(s"size(filter(toks, t -> array_contains($termsArr, t)))")
            .cast(LongType).as("qtf"),
          expr(s"size(array_intersect(array_distinct(toks), $termsArr))")
            .cast(LongType).as("g"))
      val disc = discE9.zipWithIndex.map { case (w, i) => (i + 1L, w) }
        .toDF("rk", "disc_e9")
      def top10(o: Column*): DataFrame = sc.orderBy(o: _*).limit(10)
        .withColumn("rk", row_number().over(boundedGlobalRank(o: _*)).cast(LongType))
      val dcg = top10(col("qtf").desc, col("doc_id").asc)
        .join(broadcast(disc), Seq("rk"))
        .agg(sum(expr("g * disc_e9")).as("dcg_e9"))
      val idcg = top10(col("g").desc, col("doc_id").asc)
        .join(broadcast(disc), Seq("rk"))
        .agg(sum(expr("g * disc_e9")).as("idcg_e9"))
      dcg.crossJoin(idcg)
        .select(col("dcg_e9"), col("idcg_e9"),
          expr("dcg_e9 * 1000000 div idcg_e9").as("ndcg_e6"))
    }),

    // ── G222: Kendall tau-a between two rankers (pairwise exact) ───────
    // Rank agreement between "length" (n_chars) and "lexical diversity"
    // (distinct tokens) over 20 hash-picked docs — the fixed-size probe
    // discipline (work stays 20·19/2 pairs as the corpus grows; the
    // corpus contributes one scan to score the 20). Deterministic id
    // tiebreaks make both rankings total, so every pair is concordant
    // or discordant and C + D = k(k-1)/2 exactly.
    "q277_kendall_tau" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("n_chars"),
          expr("size(array_distinct(toks))").cast(LongType).as("n_types"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(20)
      val ranked = d
        .withColumn("ra", row_number().over(
          boundedGlobalRank(col("n_chars").desc, col("doc_id").asc)).cast(LongType))
        .withColumn("rb", row_number().over(
          boundedGlobalRank(col("n_types").desc, col("doc_id").asc)).cast(LongType))
        .select("doc_id", "ra", "rb")
      val l = ranked.select(col("doc_id").as("id1"), col("ra").as("ra1"), col("rb").as("rb1"))
      val r = ranked.select(col("doc_id").as("id2"), col("ra").as("ra2"), col("rb").as("rb2"))
      l.join(broadcast(r), col("id1") < col("id2"))
        .withColumn("conc", expr("case when (ra1 - ra2) * (rb1 - rb2) > 0 then 1 else 0 end"))
        .agg(count(lit(1)).as("n_pairs"),
          sum("conc").as("concordant"),
          sum(expr("1 - conc")).as("discordant"))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          expr("(concordant - discordant) * 1000000 div n_pairs").as("tau_e6"))
    }),

    // ── G223: rank-biased overlap of two top-20 lists (RBO, p=0.9) ─────
    // How much do the "longest docs" and "most tokens" rankings agree,
    // weighted toward the top? Truncated RBO@20 = Σ_d w_d·(X_d/d) with
    // w_d = (1-p)·p^(d-1) as e12 integer literals and X_d = |A_1..d ∩
    // B_1..d| from one inner join of the two 20-row rank lists (a doc
    // enters the intersection at depth max(ra, rb)). Per-depth floor
    // division is documented floor semantics; the depth table emits the
    // full audit curve plus the scalar total. Rankers are TakeOrdered;
    // everything after the two limits is ≤ 20-row work.
    "q278_rbo" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("n_chars"),
          expr("size(toks)").cast(LongType).as("n_tokens"))
      def top20(rkName: String, o: Column*): DataFrame =
        d.orderBy(o: _*).limit(20)
          .withColumn(rkName, row_number().over(boundedGlobalRank(o: _*)).cast(LongType))
          .select(col("doc_id"), col(rkName))
      val a = top20("ra", col("n_chars").desc, col("doc_id").asc)
      val b = top20("rb", col("n_tokens").desc, col("doc_id").asc)
      val entered = a.join(b, Seq("doc_id"))
        .select(col("doc_id"), greatest(col("ra"), col("rb")).as("md"))
      val depths = rboW.zipWithIndex.map { case (w, i) => (i + 1L, w) }
        .toDF("depth", "w_e12")
      val perDepth = depths.join(broadcast(entered), col("md") <= col("depth"), "left")
        .groupBy("depth", "w_e12")
        .agg(count(col("doc_id")).as("x_d"))
        .withColumn("term_e12", expr("w_e12 * x_d div depth"))
      perDepth
        .crossJoin(broadcast(perDepth.agg(sum("term_e12").as("rbo_e12"))))
        .select("depth", "x_d", "term_e12", "rbo_e12")
        .orderBy("depth")
    })
  )

  def oracleSql: Map[String, String] = {
    val termsList = queryTerms.map(t => s"'$t'").mkString(", ")
    val discVals = discE9.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")
    val rboVals = rboW.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")
    Map(

      "q275_auc_mannwhitney" ->
        """WITH s AS (SELECT CAST(round(value*1000000) AS BIGINT) AS v6,
          |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
          |           FROM events),
          |g AS (SELECT v6, COUNT(*) AS n_s, SUM(pos) AS p_s FROM s GROUP BY v6),
          |c AS (SELECT *, SUM(n_s) OVER (ORDER BY v6) AS cum_n FROM g),
          |a AS (SELECT SUM(p_s * (2*(cum_n - n_s) + n_s + 1)) AS sum2mr,
          |             SUM(p_s) AS npos, SUM(n_s - p_s) AS nneg FROM c)
          |SELECT CAST(npos AS BIGINT) AS npos, CAST(nneg AS BIGINT) AS nneg,
          |       CAST((sum2mr - npos*(npos+1)) * 1000000 // GREATEST(2*npos*nneg, 1) AS BIGINT) AS auc_e6
          |FROM a""".stripMargin,

      "q276_ndcg" ->
        s"""WITH sc AS (SELECT doc_id,
           |    CAST(len(list_filter(${sqlTokens("text")},
           |             t -> list_contains([$termsList], t))) AS BIGINT) AS qtf,
           |    CAST(len(list_intersect(list_distinct(${sqlTokens("text")}),
           |             [$termsList])) AS BIGINT) AS g
           |  FROM documents),
           |disc AS (SELECT * FROM (VALUES $discVals) v(rk, disc_e9)),
           |t1 AS (SELECT g, ROW_NUMBER() OVER (ORDER BY qtf DESC, doc_id) AS rk
           |       FROM sc ORDER BY qtf DESC, doc_id LIMIT 10),
           |t2 AS (SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC, doc_id) AS rk
           |       FROM sc ORDER BY g DESC, doc_id LIMIT 10),
           |d1 AS (SELECT SUM(g * disc_e9) AS dcg_e9 FROM t1 JOIN disc USING (rk)),
           |d2 AS (SELECT SUM(g * disc_e9) AS idcg_e9 FROM t2 JOIN disc USING (rk))
           |SELECT CAST(dcg_e9 AS BIGINT) AS dcg_e9,
           |       CAST(idcg_e9 AS BIGINT) AS idcg_e9,
           |       CAST(dcg_e9 * 1000000 // idcg_e9 AS BIGINT) AS ndcg_e6
           |FROM d1, d2""".stripMargin,

      "q277_kendall_tau" ->
        s"""WITH d AS (SELECT doc_id, n_chars,
           |    CAST(len(list_distinct(${sqlTokens("text")})) AS BIGINT) AS n_types
           |  FROM documents
           |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20),
           |r AS (SELECT doc_id,
           |        CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS ra,
           |        CAST(ROW_NUMBER() OVER (ORDER BY n_types DESC, doc_id) AS BIGINT) AS rb
           |      FROM d),
           |p AS (SELECT CASE WHEN (l.ra - q.ra) * (l.rb - q.rb) > 0 THEN 1 ELSE 0 END AS conc
           |      FROM r l JOIN r q ON l.doc_id < q.doc_id)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |       CAST(SUM(conc) AS BIGINT) AS concordant,
           |       CAST(SUM(1 - conc) AS BIGINT) AS discordant,
           |       CAST((SUM(conc) - SUM(1 - conc)) * 1000000 // COUNT(*) AS BIGINT) AS tau_e6
           |FROM p""".stripMargin,

      "q278_rbo" ->
        s"""WITH d AS (SELECT doc_id, n_chars,
           |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens
           |  FROM documents),
           |a AS (SELECT doc_id,
           |        CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS ra
           |      FROM d ORDER BY n_chars DESC, doc_id LIMIT 20),
           |b AS (SELECT doc_id,
           |        CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rb
           |      FROM d ORDER BY n_tokens DESC, doc_id LIMIT 20),
           |e AS (SELECT a.doc_id, GREATEST(ra, rb) AS md FROM a JOIN b USING (doc_id)),
           |w AS (SELECT * FROM (VALUES $rboVals) v(depth, w_e12)),
           |pd AS (SELECT depth, w_e12, COUNT(e.doc_id) AS x_d,
           |         w_e12 * COUNT(e.doc_id) // depth AS term_e12
           |       FROM w LEFT JOIN e ON e.md <= w.depth
           |       GROUP BY depth, w_e12),
           |t AS (SELECT SUM(term_e12) AS rbo_e12 FROM pd)
           |SELECT CAST(depth AS BIGINT) AS depth, CAST(x_d AS BIGINT) AS x_d,
           |       CAST(term_e12 AS BIGINT) AS term_e12,
           |       CAST(rbo_e12 AS BIGINT) AS rbo_e12
           |FROM pd, t ORDER BY depth""".stripMargin
    )
  }
}
