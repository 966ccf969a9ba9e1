package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-operations wave (round 11, second wave): the dedup
  * threshold-sensitivity sweep, split-level contamination, tokenizer
  * fertility, and retrieval context packing.
  *
  * Reference intent — each query names its consumer (r10 verdict
  * "next" #4):
  *  - q527: q23/q79/q87 dedup at ONE Jaccard threshold; the curation
  *    owner's first question is "what does the corpus lose if we move
  *    τ?" — the sensitivity sweep over the landed pair table is that
  *    answer. Consumer: the τ choice in the q87 corpus pipeline.
  *  - q528: q82 checks benchmark contamination; the OTHER leak is
  *    between the pipeline's own train/test split (q51) — a test doc
  *    whose 3-grams mostly appear in train docs inflates eval.
  *    Consumer: the q51 split before anyone trains on it (Lee et al.
  *    2022 decontamination discipline at split grain).
  *  - q529: q85 packs sequences into token budgets and q83 histograms
  *    token counts, but both assume a tokenizer; fertility (subword
  *    tokens per word) and bytes-per-token per language are THE
  *    metrics a tokenizer choice is judged by (Rust et al. 2021). The
  *    subword rule here is the declared stand-in (fixed 4-char
  *    chunks — same role as the multimodal decode stub: the metric
  *    plumbing is real, the tokenizer is pluggable). Consumer: q85's
  *    budget arithmetic, which silently assumes a fertility of 1.
  *  - q530: q26's exact retrieval hands top-k docs to a context
  *    window; what fits is a greedy first-fit packing under a token
  *    budget. Measures utilization and rank-order fragmentation
  *    (better-ranked docs skipped for being too big). Consumer: the
  *    RAG context assembly over q26's ranking + q86's chunks.
  */
object CurationOpsQueries {

  private val Taus: Seq[Long] = (2 to 9).map(_ * 100000L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G472: dedup threshold-sensitivity sweep ────────────────────────
    // Rides the landed q23 pair table (doc_a < doc_b, exact-verified
    // j_e6). Per τ: surviving pairs, docs touched, docs removed under
    // the keep-lowest-id pair rule (doc_b of any surviving pair), and
    // the corpus removal rate. One pair-table scan exploded 8× — pair-
    // grain, never corpus².
    "q527_dedup_threshold_sweep" -> ((s, dir) => {
      val pairs = FeatureQueries.dupPairsTable(s, dir)
      val nDocs = Tables.documents(s, dir).count()
      val sweep = pairs
        .crossJoin(broadcast(s.createDataFrame(
          Taus.map(Tuple1(_))).toDF("tau_e6")))
        .filter(col("j_e6") >= col("tau_e6"))
      val pairCnt = sweep.groupBy("tau_e6").agg(count(lit(1)).as("n_pairs"))
      val touched = sweep
        .select(col("tau_e6"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .distinct()
        .groupBy("tau_e6").agg(count(lit(1)).as("n_docs_touched"))
      val removed = sweep.select(col("tau_e6"), col("doc_b")).distinct()
        .groupBy("tau_e6").agg(count(lit(1)).as("n_removed"))
      pairCnt.join(touched, "tau_e6").join(removed, "tau_e6")
        .withColumn("removal_rate_e4", expr(s"n_removed * 10000 div ${nDocs}L"))
        .select("tau_e6", "n_pairs", "n_docs_touched", "n_removed",
          "removal_rate_e4")
        .orderBy("tau_e6")
    }),

    // ── G473: train→test split contamination (3-gram overlap) ──────────
    // q51's md5 split over the landed 3-gram table: a test doc's
    // contamination is the share of its distinct 3-grams that exist in
    // ANY train doc; ≥50% flags it. Train grams collapse to a distinct
    // set before the join (broadcast at this scale; a bloom-pruned
    // shuffle join at 100 TB — q110's discipline).
    "q528_split_contamination" -> ((s, dir) => {
      val g = TextQueries.gramTable(s, dir)
        .withColumn("split", expr(
          "case when substring(md5(cast(doc_id as string)), 1, 1) <= 'b' " +
            "then 'train' when substring(md5(cast(doc_id as string)), 1, 1) " +
            "<= 'd' then 'val' else 'test' end"))
      val trainG = g.filter(col("split") === "train")
        .select(explode(col("g")).as("gram")).distinct()
      val te = g.filter(col("split") === "test")
        .select(col("doc_id"), col("lang"), explode(col("g")).as("gram"))
        .join(broadcast(trainG.withColumn("hit", lit(1L))), Seq("gram"), "left")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      te.groupBy("lang")
        .agg(count(lit(1)).as("n_test_docs"),
          sum("n_grams").as("n_grams"), sum("n_hit").as("n_hit"),
          sum(expr("case when n_hit * 2 >= n_grams then 1L else 0L end"))
            .as("n_contaminated"))
        .withColumn("overlap_e4", expr("n_hit * 10000 div n_grams"))
        .select("lang", "n_test_docs", "n_grams", "n_hit", "overlap_e4",
          "n_contaminated")
        .orderBy("lang")
    }),

    // ── G474: tokenizer fertility / bytes-per-token per language ───────
    // words = whitespace tokens; subword tokens = Σ⌈len(word)/4⌉ (the
    // declared stand-in tokenizer — fixed-width chunks, deterministic
    // in both engines); fertility e4 = subwords·10⁴ div words, bytes
    // per token e2 from n_chars. Per-language one-pass aggregate.
    "q529_tokenizer_fertility" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"),
          expr("size(split(trim(text), '\\\\s+'))").cast("long").as("words"),
          expr("aggregate(split(trim(text), '\\\\s+'), 0L, " +
            "(a, t) -> a + (length(t) + 3) div 4)").as("subwords"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("words").as("words"),
          sum("subwords").as("subwords"), sum("n_chars").as("chars"))
        .withColumn("fertility_e4", expr("subwords * 10000 div words"))
        .withColumn("bytes_per_token_e2", expr("chars * 100 div subwords"))
        .select("lang", "n_docs", "words", "subwords", "fertility_e4",
          "bytes_per_token_e2")
        .orderBy("lang")
    }),

    // ── G475: retrieval context packing under a token budget ───────────
    // Exact top-20 by cosine (q26's arm) against query vector 0, doc
    // token counts joined on vec_id = doc_id (the corpus convention),
    // greedy FIRST-FIT in rank order into a 2000-token budget. Emits
    // utilization and fragmentation (ranks skipped mid-list). The fold
    // runs over 20 rows — rank-grain, after the corpus-wide TakeOrdered.
    "q530_context_packing" -> ((s, dir) => {
      import graft.functions.VectorFunctions.{asDouble, cosineR6}
      val e = Tables.embeddings(s, dir)
      val top = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("ve"))
        .crossJoin(broadcast(e.filter(col("vec_id") === 0)
          .select(asDouble(col("embedding")).as("qe"))))
        .select(col("vec_id"), cosineR6(col("ve"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id").asc).limit(20)
      val withTok = top.join(Tables.documents(s, dir)
          .select(col("doc_id").as("vec_id"),
            expr("size(split(trim(text), '\\\\s+'))").cast("long").as("ntok")),
          "vec_id")
      val packed = withTok
        .agg(expr("array_sort(collect_list(struct(-cos_r as nc, vec_id, ntok)))")
          .as("xs"), count(lit(1)).as("n_cands"))
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('used', 0L, 'np', 0L, 'skip', 0L, 'xp', 0L),
            |  (acc, z) -> case when acc.used + z.ntok <= 2000L
            |    then named_struct('used', acc.used + z.ntok,
            |      'np', acc.np + 1L, 'skip', acc.skip,
            |      'xp', acc.xp ^ z.vec_id)
            |    else named_struct('used', acc.used, 'np', acc.np,
            |      'skip', acc.skip + 1L, 'xp', acc.xp) end)""".stripMargin))
      packed.select(lit(2000L).as("budget"), col("n_cands"),
          expr("st.np").as("n_packed"), expr("st.used").as("tokens_used"),
          expr("st.used * 10000 div 2000").as("utilization_e4"),
          expr("st.skip").as("n_skipped"),
          expr("st.xp").as("xor_packed_ids"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q527_dedup_threshold_sweep" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH pairs AS MATERIALIZED (SELECT * FROM ($q23)),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |taus AS (SELECT UNNEST([${Taus.mkString(", ")}]) AS tau_e6),
        |sweep AS MATERIALIZED (SELECT t.tau_e6, p.doc_a, p.doc_b
        |  FROM pairs p, taus t WHERE p.j_e6 >= t.tau_e6),
        |pc AS (SELECT tau_e6, COUNT(*) AS n_pairs FROM sweep GROUP BY 1),
        |tc AS (SELECT tau_e6, COUNT(*) AS n_docs_touched FROM
        |  (SELECT DISTINCT tau_e6, UNNEST([doc_a, doc_b]) AS d FROM sweep)
        |  GROUP BY 1),
        |rc AS (SELECT tau_e6, COUNT(*) AS n_removed FROM
        |  (SELECT DISTINCT tau_e6, doc_b FROM sweep) GROUP BY 1)
        |SELECT CAST(pc.tau_e6 AS BIGINT) AS tau_e6,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(n_docs_touched AS BIGINT) AS n_docs_touched,
        |  CAST(n_removed AS BIGINT) AS n_removed,
        |  CAST(n_removed * 10000 // nd.n_docs AS BIGINT) AS removal_rate_e4
        |FROM pc JOIN tc ON pc.tau_e6 = tc.tau_e6
        |JOIN rc ON pc.tau_e6 = rc.tau_e6, nd
        |ORDER BY tau_e6""".stripMargin
    },

    "q528_split_contamination" -> {
      val toks = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH t AS (SELECT doc_id, lang, $toks AS toks FROM documents),
        |d AS MATERIALIZED (SELECT doc_id, lang,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
        |      THEN 'train'
        |      WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
        |      THEN 'val' ELSE 'test' END AS split
        |  FROM t WHERE len(toks) >= 3),
        |tg AS MATERIALIZED (SELECT DISTINCT UNNEST(g) AS gram FROM d
        |      WHERE split = 'train'),
        |te AS (SELECT doc_id, lang, UNNEST(g) AS gram FROM d
        |       WHERE split = 'test'),
        |sc AS (SELECT te.doc_id, te.lang, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM te LEFT JOIN tg ON te.gram = tg.gram
        |  GROUP BY te.doc_id, te.lang)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_test_docs,
        |  CAST(SUM(n_grams) AS BIGINT) AS n_grams,
        |  CAST(SUM(n_hit) AS BIGINT) AS n_hit,
        |  CAST(SUM(n_hit) * 10000 // SUM(n_grams) AS BIGINT) AS overlap_e4,
        |  CAST(SUM(CASE WHEN n_hit * 2 >= n_grams THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contaminated
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q529_tokenizer_fertility" -> {
      val toks = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH t AS (SELECT lang, n_chars,
        |    CAST(len($toks) AS BIGINT) AS words,
        |    CAST(list_sum(list_transform($toks,
        |      w -> (length(w) + 3) // 4)) AS BIGINT) AS subwords
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(words) AS BIGINT) AS words,
        |  CAST(SUM(subwords) AS BIGINT) AS subwords,
        |  CAST(SUM(subwords) * 10000 // SUM(words) AS BIGINT) AS fertility_e4,
        |  CAST(SUM(n_chars) * 100 // SUM(subwords) AS BIGINT)
        |    AS bytes_per_token_e2
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q530_context_packing" -> {
      val cosR6 = graft.functions.VectorFunctions.sqlCosineR6("ve", "qe")
      val toks = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH RECURSIVE q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
        |      FROM embeddings WHERE vec_id != 0),
        |top AS MATERIALIZED (SELECT vec_id, $cosR6 AS cos_r
        |  FROM e, q ORDER BY cos_r DESC, vec_id LIMIT 20),
        |wt AS MATERIALIZED (SELECT t.vec_id, t.cos_r,
        |    CAST(len($toks) AS BIGINT) AS ntok,
        |    ROW_NUMBER() OVER (ORDER BY t.cos_r DESC, t.vec_id) AS i
        |  FROM top t JOIN documents d ON t.vec_id = d.doc_id),
        |nc AS (SELECT COUNT(*) AS n_cands FROM wt),
        |rec AS (
        |  SELECT 0::BIGINT AS i, 0::BIGINT AS used, 0::BIGINT AS np,
        |    0::BIGINT AS skip, 0::BIGINT AS xp
        |  UNION ALL
        |  SELECT w.i,
        |    CASE WHEN r.used + w.ntok <= 2000 THEN r.used + w.ntok
        |         ELSE r.used END,
        |    CASE WHEN r.used + w.ntok <= 2000 THEN r.np + 1 ELSE r.np END,
        |    CASE WHEN r.used + w.ntok <= 2000 THEN r.skip ELSE r.skip + 1 END,
        |    CASE WHEN r.used + w.ntok <= 2000 THEN xor(r.xp, w.vec_id)
        |         ELSE r.xp END
        |  FROM rec r JOIN wt w ON w.i = r.i + 1)
        |SELECT CAST(2000 AS BIGINT) AS budget,
        |  CAST(nc.n_cands AS BIGINT) AS n_cands,
        |  CAST(np AS BIGINT) AS n_packed, CAST(used AS BIGINT) AS tokens_used,
        |  CAST(used * 10000 // 2000 AS BIGINT) AS utilization_e4,
        |  CAST(skip AS BIGINT) AS n_skipped,
        |  CAST(xp AS BIGINT) AS xor_packed_ids
        |FROM rec, nc WHERE rec.i = nc.n_cands""".stripMargin
    }
  )
}
