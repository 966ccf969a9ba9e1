package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.ops.Relational.boundedGlobalRank

/** Relevance-ranking operators (round 9, twelfth wave): the retrieval
  * scorers a corpus-curation pipeline runs to probe and mine its own
  * training data — BM25, Dirichlet-smoothed query likelihood, and
  * positional min-window proximity.
  *
  * Reference intent: the reference's query surface is SQLAlchemy
  * filters over exact keys (services/web-ui/app/db_utils.py:38-51);
  * it never ranks. A 100-TB document corpus is queried the other way
  * round — "find the documents most about X" — and the three
  * canonical scorers (BM25, query-likelihood LM, proximity) are pure
  * relational plans over the same posting shape q81/q148/q175 landed:
  * tokenize → explode → per-(doc,term) counts. Everything here is
  * scaled-BIGINT rational arithmetic (floor div, fixed op order), so
  * the DuckDB oracle matches bit-for-bit — no floats, no ln().
  */
object SearchQueries {

  /** The fixed probe query; three mid-frequency vocabulary terms. */
  private val Terms = Seq("spark", "window", "merge")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G166: BM25 ranked retrieval (integer Okapi scoring) ────────────
    // score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    // with k1=1.2, b=0.75, idf = (N−df+½)/(df+½) (log-free variant:
    // monotone in the classic idf, exact in integers). Substituting
    // avgdl = Σdl/N and clearing denominators makes every factor a
    // ratio of BIGINTs:
    //   idf_e6   = 1e6·(2N−2df+1) div (2df+1)
    //   tfsat_e6 = 1e6·22·tf·Σdl div (10·tf·Σdl + 3·Σdl + 9·dl·N)
    // (k1+1 = 22/10; k1·(1−b) = 3/10; k1·b·N/Σdl = 9N/(10Σdl)).
    // Plan shape: ONE tokenize+explode scan feeds both the per-doc
    // length aggregate and the per-(doc,term) tf aggregate; the
    // query-term filter sits UNDER the explode projection so only the
    // 3 terms' posting rows shuffle; df and the corpus scalars (N,
    // Σdl) are term-count-sized → broadcast. Top-20 via one global
    // TakeOrdered. At 1e12 docs swap the idf product to DECIMAL(38).
    "q221_bm25" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      val tf = toks.filter(col("tok").isin(Terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("idf_e6",
          expr("(1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1)"))
        .withColumn("tfsat_e6",
          expr("(1000000 * 22 * cast(tf as decimal(38,0)) * sum_dl) div (10 * cast(tf as decimal(38,0)) * sum_dl + 3*sum_dl + 9 * cast(dl as decimal(38,0)) * n_docs)"))
        .withColumn("contrib_e6", expr("idf_e6 * tfsat_e6 div 1000000"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("contrib_e6").as("score_e6"))
      scored
        .orderBy(col("score_e6").desc, col("doc_id").asc)
        .limit(20)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("score_e6").desc, col("doc_id").asc)).cast(LongType))
        .orderBy("rk")
    }),

    // ── G167: Dirichlet query-likelihood ranking (smoothed LM) ─────────
    // p(q|d) = Π_t (tf + μ·p(t|C)) / (dl + μ), μ=50. With p(t|C) =
    // ctf/|C| each factor is the exact rational (tf·|C| + μ·ctf) /
    // ((dl+μ)·|C|), scaled e6 with floor div. Smoothing is the point:
    // docs MISSING a term still score (the μ·ctf mass), so the plan is
    // docs × terms (3-row broadcast cross join) LEFT JOIN tf — the
    // relational transcription of "every document gets a probability".
    // The 3 factors pivot into columns and multiply as DECIMAL(38,0)
    // (three e6 factors ≤ 1e18 — BIGINT would sit on the edge).
    "q222_dirichlet_lm" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = toks.agg(count(lit(1)).as("c_toks"))
      val tf = toks.filter(col("tok").isin(Terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val ctf = toks.filter(col("tok").isin(Terms: _*))
        .groupBy("tok").agg(count(lit(1)).as("ctf"))
      val terms = ctf.crossJoin(corpus) // 3 rows
      val factors = dl
        .crossJoin(broadcast(terms))
        .join(tf, Seq("doc_id", "tok"), "left")
        .withColumn("tf0", coalesce(col("tf"), lit(0L)))
        .withColumn("f_e6",
          expr("(1000000 * (tf0 * c_toks + 50 * ctf)) div ((dl + 50) * c_toks)"))
      val pivoted = factors.groupBy("doc_id").agg(
        max(when(col("tok") === Terms(0), col("f_e6"))).as("f1"),
        max(when(col("tok") === Terms(1), col("f_e6"))).as("f2"),
        max(when(col("tok") === Terms(2), col("f_e6"))).as("f3"))
        .withColumn("score_e18",
          expr("cast(f1 as decimal(38,0)) * f2 * f3"))
      pivoted
        .select(col("doc_id"), col("score_e18"))
        .orderBy(col("score_e18").desc, col("doc_id").asc)
        .limit(20)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("score_e18").desc, col("doc_id").asc)).cast(LongType))
        .orderBy("rk")
    }),

    // ── G168: positional min-window proximity (minimal span) ───────────
    // The smallest token window containing ALL query terms — the
    // proximity feature every learning-to-rank stack computes, and the
    // classic "can't do it with a self-join at scale" operator. Plan:
    // filter the posting rows to the 3 terms (under the explode), then
    // ONE (doc_id, pos)-sorted window exchange carries three
    // conditional running-max columns (last position of each term so
    // far — the q214 carry-forward trick); wherever all three are
    // non-null, pos − min(last) + 1 is the tightest window ENDING
    // here, and the per-doc MIN over those is the exact minimal span
    // (every optimal window ends at some term occurrence). Linear in
    // posting rows, zero joins; position-base-invariant so Spark's
    // 0-based posexplode and DuckDB's 1-based subscripts agree.
    "q223_min_window" -> ((s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .filter(col("tok").isin(Terms: _*))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withLast = t
        .withColumn("la", max(when(col("tok") === Terms(0), col("pos"))).over(w))
        .withColumn("lb", max(when(col("tok") === Terms(1), col("pos"))).over(w))
        .withColumn("lc", max(when(col("tok") === Terms(2), col("pos"))).over(w))
        .filter(col("la").isNotNull && col("lb").isNotNull && col("lc").isNotNull)
        .withColumn("span", col("pos") - least(col("la"), col("lb"), col("lc")) + 1)
      withLast.groupBy("doc_id")
        .agg(min("span").cast(LongType).as("best_span"))
        .orderBy(col("best_span").asc, col("doc_id").asc)
        .limit(20)
    }),

    // ── G216: reciprocal-rank fusion of BM25 × Dirichlet LM (q271) ─────
    // The standard zero-tuning way to combine heterogeneous rankers
    // (Cormack et al. 2009): fused score = Σ 1/(60 + rank), here the
    // exact e6 floor 1000000 div (60 + rk), summed over the two landed
    // top-20 lists (FULL OUTER on doc_id — a doc ranked by only one
    // retriever still scores; the absent list contributes 0). The two
    // input rankings rerun the q221/q222 operators unchanged — at scale
    // a search tier fuses ranker OUTPUTS (k rows each), so the fusion
    // itself is a k-row join + TakeOrdered, essentially free. Ties
    // (identical rank pairs ⇒ identical fused score) break on doc_id.
    "q271_rrf_fusion" -> ((s, dir) => {
      val a = queries("q221_bm25")(s, dir).select(col("doc_id"), col("rk").as("rk_a"))
      val b = queries("q222_dirichlet_lm")(s, dir).select(col("doc_id"), col("rk").as("rk_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .withColumn("rrf_e6", expr(
          "coalesce(1000000 div (60 + rk_a), 0) + coalesce(1000000 div (60 + rk_b), 0)"))
        .orderBy(col("rrf_e6").desc, col("doc_id").asc)
        .limit(10)
        .withColumn("fused_rk", row_number().over(
          boundedGlobalRank(col("rrf_e6").desc, col("doc_id").asc)).cast(LongType))
        .select("fused_rk", "doc_id", "rk_a", "rk_b", "rrf_e6")
        .orderBy("fused_rk")
    })
  )

  private val toks = sqlTokens("text")

  def oracleSql: Map[String, String] = Map(

    "q221_bm25" -> Bm25OracleSql,


    "q222_dirichlet_lm" -> DirichletOracleSql,

    "q223_min_window" ->
      s"""WITH x AS (SELECT doc_id, UNNEST($toks) AS tok,
         |             generate_subscripts($toks, 1) AS pos
         |           FROM documents),
         |t AS (SELECT doc_id, tok, pos FROM x
         |      WHERE tok IN ('spark','window','merge')),
         |carry AS (SELECT doc_id, pos,
         |  MAX(CASE WHEN tok = 'spark'  THEN pos END) OVER wnd AS la,
         |  MAX(CASE WHEN tok = 'window' THEN pos END) OVER wnd AS lb,
         |  MAX(CASE WHEN tok = 'merge'  THEN pos END) OVER wnd AS lc
         |  FROM t
         |  WINDOW wnd AS (PARTITION BY doc_id ORDER BY pos
         |                 ROWS UNBOUNDED PRECEDING)),
         |sp AS (SELECT doc_id, pos - LEAST(la, lb, lc) + 1 AS span
         |       FROM carry WHERE la IS NOT NULL AND lb IS NOT NULL AND lc IS NOT NULL)
         |SELECT doc_id, CAST(MIN(span) AS BIGINT) AS best_span
         |FROM sp GROUP BY doc_id
         |ORDER BY best_span, doc_id LIMIT 20""".stripMargin,

    "q271_rrf_fusion" ->
      s"""WITH a AS (SELECT doc_id, rk AS rk_a FROM ($Bm25OracleSql)),
         |b AS (SELECT doc_id, rk AS rk_b FROM ($DirichletOracleSql)),
         |f AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, rk_a, rk_b,
         |        COALESCE(1000000 // (60 + rk_a), 0)
         |          + COALESCE(1000000 // (60 + rk_b), 0) AS rrf_e6
         |      FROM a FULL OUTER JOIN b USING (doc_id))
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT)
         |         AS fused_rk,
         |       doc_id, rk_a, rk_b, CAST(rrf_e6 AS BIGINT) AS rrf_e6
         |FROM f ORDER BY rrf_e6 DESC, doc_id LIMIT 10""".stripMargin
  )

  /** Shared ranker oracles: bound once so q271's fusion oracle can embed
    * the exact q221/q222 definitions without re-entrant map construction. */
  private lazy val Bm25OracleSql: String =
        s"""WITH x AS (SELECT doc_id, UNNEST($toks) AS tok FROM documents),
           |dl AS (SELECT doc_id, COUNT(*) AS dl FROM x GROUP BY doc_id),
           |c AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
           |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM x
           |       WHERE tok IN ('spark','window','merge') GROUP BY doc_id, tok),
           |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
           |sc AS (SELECT tf.doc_id,
           |         (1000000 * (2*c.n_docs - 2*df.df + 1)) // (2*df.df + 1) AS idf_e6,
           |         (1000000 * 22 * CAST(tf.tf AS HUGEINT) * c.sum_dl)
           |           // (10*CAST(tf.tf AS HUGEINT)*c.sum_dl + 3*c.sum_dl + 9*CAST(dl.dl AS HUGEINT)*c.n_docs) AS tfsat_e6
           |       FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), c),
           |agg AS (SELECT doc_id, COUNT(*) AS n_terms,
           |          SUM(idf_e6 * tfsat_e6 // 1000000) AS score_e6
           |        FROM sc GROUP BY doc_id)
           |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms,
           |       CAST(score_e6 AS BIGINT) AS score_e6,
           |       CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rk
           |FROM agg ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin

  private lazy val DirichletOracleSql: String =
        s"""WITH x AS (SELECT doc_id, UNNEST($toks) AS tok FROM documents),
           |dl AS (SELECT doc_id, COUNT(*) AS dl FROM x GROUP BY doc_id),
           |c AS (SELECT COUNT(*) AS c_toks FROM x),
           |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM x
           |       WHERE tok IN ('spark','window','merge') GROUP BY doc_id, tok),
           |ctf AS (SELECT tok, COUNT(*) AS ctf FROM x
           |        WHERE tok IN ('spark','window','merge') GROUP BY tok),
           |f AS (SELECT dl.doc_id, ctf.tok,
           |        (1000000 * (COALESCE(tf.tf, 0) * c.c_toks + 50 * ctf.ctf))
           |          // ((dl.dl + 50) * c.c_toks) AS f_e6
           |      FROM dl CROSS JOIN ctf CROSS JOIN c
           |      LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.tok = ctf.tok),
           |p AS (SELECT doc_id,
           |        MAX(CASE WHEN tok = 'spark'  THEN f_e6 END) AS f1,
           |        MAX(CASE WHEN tok = 'window' THEN f_e6 END) AS f2,
           |        MAX(CASE WHEN tok = 'merge'  THEN f_e6 END) AS f3
           |      FROM f GROUP BY doc_id)
           |SELECT doc_id,
           |       CAST(CAST(f1 AS HUGEINT) * f2 * f3 AS DECIMAL(38,0)) AS score_e18,
           |       CAST(ROW_NUMBER() OVER (
           |         ORDER BY CAST(f1 AS HUGEINT) * f2 * f3 DESC, doc_id) AS BIGINT) AS rk
           |FROM p ORDER BY CAST(f1 AS HUGEINT) * f2 * f3 DESC, doc_id LIMIT 20""".stripMargin
}
