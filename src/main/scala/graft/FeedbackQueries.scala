package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.ops.Relational.boundedGlobalRank

/** Retrieval feedback + epoch-sharding ops (round 10, thirtieth wave):
  * Rocchio pseudo-relevance-feedback query expansion, a BPE pair-
  * statistics step, session entry/exit flow census, and a snake-
  * balanced shard manifest for distributed training.
  *
  * Reference intent: the reference serves static forecasts; it has no
  * retrieval loop and no training-shard logic. These are the second-
  * round ops a search/training platform runs on top of the landed
  * first-round artifacts (q221's ranking, q50's sessions, q85's
  * packing): expand the query from what it found, count the merge
  * BPE would make, map how sessions start and end, and cut the epoch
  * into balanced shards. House disciplines throughout — integer BM25
  * rationals, floor-div scaling, id tiebreaks, scale-safe global ranks.
  */
object FeedbackQueries {

  private val Terms = Seq("spark", "window", "merge")

  /** Integer Okapi BM25 scoring against an arbitrary (small) term set —
    * q221's exact arithmetic with the term filter as a broadcast
    * semi-join instead of a literal IN (the expansion terms are
    * data-dependent). Returns (doc_id, score_e6). */
  private def bm25Scores(s: SparkSession, dir: String, terms: DataFrame): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = toks.join(broadcast(terms), Seq("tok"), "left_semi")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_e6",
        expr("(1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1)"))
      .withColumn("tfsat_e6",
        expr("(1000000 * 22 * cast(tf as decimal(38,0)) * sum_dl) div (10 * cast(tf as decimal(38,0)) * sum_dl + 3*sum_dl + 9 * cast(dl as decimal(38,0)) * n_docs)"))
      .withColumn("contrib_e6", expr("idf_e6 * tfsat_e6 div 1000000"))
      .groupBy("doc_id")
      .agg(sum("contrib_e6").as("score_e6"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G240: Rocchio pseudo-relevance feedback (query expansion) ──────
    // Round 1: BM25 top-5 for the 3-term query (assumed relevant —
    // that's the "pseudo"). Round 2: candidate expansion terms scored
    // by feedback-df × corpus idf_e6 (the log-free Robertson offer
    // weight), top-3 non-query terms join the query; the corpus is
    // re-scored with all 6 terms. Output: final top-10 with expanded
    // score and a flag for docs the original query would have missed —
    // the recall the feedback loop BUYS. Feedback work is 5-doc
    // bounded; each scoring pass is q221's one-explode-scan shape.
    "q295_rocchio_prf" -> ((s, dir) => {
      val termDf = Terms.foldLeft(s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("tok", StringType)))))((acc, t) =>
        acc.unionAll(s.sql(s"select '$t' as tok")))
      val base = bm25Scores(s, dir, termDf)
      val fb = base.orderBy(col("score_e6").desc, col("doc_id").asc).limit(5)
        .select("doc_id")
      val fbToks = Tables.documents(s, dir)
        .join(broadcast(fb), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      val corpusDf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val expansion = fbToks.groupBy("tok").agg(count(lit(1)).as("fb_df"))
        .filter(!col("tok").isin(Terms: _*))
        .join(corpusDf, Seq("tok"))
        .crossJoin(broadcast(nDocs))
        .withColumn("offer_e6",
          expr("fb_df * ((1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1))"))
        .orderBy(col("offer_e6").desc, col("tok").asc).limit(3)
        .select("tok")
      val expanded = bm25Scores(s, dir, termDf.unionAll(expansion))
      val baseTop10 = base.orderBy(col("score_e6").desc, col("doc_id").asc).limit(10)
        .select("doc_id")
      expanded.orderBy(col("score_e6").desc, col("doc_id").asc).limit(10)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("score_e6").desc, col("doc_id").asc)).cast(LongType))
        .join(baseTop10.withColumn("in_base", lit(true)), Seq("doc_id"), "left")
        .select(col("rk"), col("doc_id"), col("score_e6"),
          coalesce(col("in_base"), lit(false)).as("new_via_feedback"))
        .withColumn("new_via_feedback", !col("new_via_feedback"))
        .orderBy("rk")
    }),

    // ── G241: BPE pair-statistics step (tokenizer-training primitive) ──
    // The inner loop of byte-pair-encoding training: weighted counts of
    // adjacent character pairs across the corpus vocabulary — pair
    // counts come from the DISTINCT word table (vocab-sized) joined to
    // corpus word frequencies, so the corpus contributes one token
    // scan and the char-pair explode touches Σ|word| chars over the
    // VOCABULARY, not the corpus. Top-10 merge candidates with exact
    // weighted counts; the #1 row is the merge BPE would perform.
    "q296_bpe_pair_stats" -> ((s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_w"))
        .filter(length(col("w")) >= 2)
      val pairs = words
        .select(col("c_w"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum("c_w").as("weighted_count"),
          count(lit(1)).as("n_vocab_words"))
      pairs.orderBy(col("weighted_count").desc, col("pair").asc).limit(10)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("weighted_count").desc, col("pair").asc)).cast(LongType))
        .select("rk", "pair", "weighted_count", "n_vocab_words")
        .orderBy("rk")
    }),

    // ── G242: session entry/exit flow census (bounce surface) ──────────
    // Where do sessions start and end? q50's exact sessionization
    // (1800 s gap), then each session's first and last event type by
    // (sec, event_id) — two conditional aggregates on the session
    // grain, no second window — cross-tabulated into the entry×exit
    // flow matrix with single-event (bounce) sessions counted
    // separately. The product-analytics table behind "users who enter
    // via search leave via purchase".
    "q297_entry_exit" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
      val sess = graft.ops.Relational.sessionize(
        e, Seq("user_id"), col("sec"), col("event_id"), gapSec = 1800L)
      val perSession = sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min_by(col("event_type"), struct(col("sec"), col("event_id"))).as("entry_type"),
          max_by(col("event_type"), struct(col("sec"), col("event_id"))).as("exit_type"))
      perSession.groupBy("entry_type", "exit_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .orderBy("entry_type", "exit_type")
    }),

    // ── G243: snake-balanced shard manifest (epoch cut for training) ───
    // Cut the corpus into 8 shards with near-equal token mass WITHOUT a
    // bin-packing loop: global rank by (difficulty desc, id) via
    // contiguousIds (scale-safe), then serpentine assignment — block
    // r div 8 even → shard r mod 8, odd → 7 − (r mod 8) — which pairs
    // heavy with light deterministically and bounds shard spread by
    // O(max item) per block pair. Emits per-shard mass and the exact
    // e4 deviation from the floored mean — the manifest a data-loader
    // consumes, with its balance proof attached.
    "q298_shard_manifest" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("n_toks"))
      val ranked = graft.ops.Relational.contiguousIds(
        d.repartitionByRange(32, col("n_toks").desc, col("doc_id").asc)
          .sortWithinPartitions(col("n_toks").desc, col("doc_id").asc), "r0")
      val sharded = ranked.withColumn("shard", expr(
        "case when (r0 div 8) % 2 = 0 then r0 % 8 else 7 - (r0 % 8) end"))
      val per = sharded.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_tokens"))
      per.crossJoin(broadcast(per.agg(
          expr("sum(sum_tokens) div count(1)").as("mean_tokens"))))
        .select(col("shard"), col("n_docs"), col("sum_tokens"),
          expr("(sum_tokens - mean_tokens) * 10000 div greatest(mean_tokens, 1)")
            .as("dev_e4"))
        .orderBy("shard")
    })
  )

  def oracleSql: Map[String, String] = {
    val termsIn = Terms.map(t => s"'$t'").mkString(", ")
    val termsRows = Terms.map(t => s"('$t')").mkString(", ")
    val bm25 = (termsSrc: String, out: String) =>
      s"""${out}_tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
         |  WHERE tok IN (SELECT tok FROM $termsSrc) GROUP BY doc_id, tok),
         |${out}_df AS (SELECT tok, COUNT(*) AS df FROM ${out}_tf GROUP BY tok),
         |$out AS (SELECT doc_id, SUM(
         |    ((1000000 * (2*n_docs - 2*df + 1)) // (2*df + 1))
         |    * ((1000000 * 22 * CAST(tf AS HUGEINT) * sum_dl) // (10*CAST(tf AS HUGEINT)*sum_dl + 3*sum_dl + 9*CAST(dl AS HUGEINT)*n_docs))
         |    // 1000000) AS score_e6
         |  FROM ${out}_tf JOIN ${out}_df USING (tok) JOIN dl USING (doc_id), corpus
         |  GROUP BY doc_id)""".stripMargin
    Map(

      "q295_rocchio_prf" ->
        s"""WITH toks AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents),
           |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
           |corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
           |q0 AS (SELECT * FROM (VALUES $termsRows) v(tok)),
           |${bm25("q0", "base")},
           |fb AS (SELECT doc_id FROM base ORDER BY score_e6 DESC, doc_id LIMIT 5),
           |dtoks AS (SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS tok
           |          FROM documents),
           |cdf AS (SELECT tok, COUNT(*) AS df FROM dtoks GROUP BY tok),
           |exp AS (SELECT dt.tok FROM dtoks dt JOIN fb USING (doc_id)
           |        JOIN cdf ON dt.tok = cdf.tok, corpus
           |        WHERE dt.tok NOT IN ($termsIn)
           |        GROUP BY dt.tok, cdf.df, corpus.n_docs
           |        ORDER BY COUNT(*) * ((1000000 * (2*corpus.n_docs - 2*cdf.df + 1))
           |                             // (2*cdf.df + 1)) DESC, dt.tok
           |        LIMIT 3),
           |q1 AS (SELECT tok FROM q0 UNION ALL SELECT tok FROM exp),
           |${bm25("q1", "ex")},
           |bt AS (SELECT doc_id FROM base ORDER BY score_e6 DESC, doc_id LIMIT 10),
           |top AS (SELECT doc_id, score_e6,
           |          ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS rk
           |        FROM ex ORDER BY score_e6 DESC, doc_id LIMIT 10)
           |SELECT CAST(rk AS BIGINT) AS rk, doc_id,
           |       CAST(score_e6 AS BIGINT) AS score_e6,
           |       (top.doc_id NOT IN (SELECT doc_id FROM bt)) AS new_via_feedback
           |FROM top ORDER BY rk""".stripMargin,

      "q296_bpe_pair_stats" ->
        s"""WITH w AS (SELECT w, COUNT(*) AS c_w FROM
           |    (SELECT unnest(${sqlTokens("text")}) AS w FROM documents)
           |  GROUP BY w HAVING length(w) >= 2),
           |p AS (SELECT unnest(list_transform(range(1, length(w)),
           |               i -> substr(w, CAST(i AS INT), 2))) AS pair, c_w
           |      FROM w),
           |g AS (SELECT pair, SUM(c_w) AS weighted_count, COUNT(*) AS n_vocab_words
           |      FROM p GROUP BY pair)
           |SELECT CAST(ROW_NUMBER() OVER (ORDER BY weighted_count DESC, pair) AS BIGINT) AS rk,
           |       pair, CAST(weighted_count AS BIGINT) AS weighted_count,
           |       CAST(n_vocab_words AS BIGINT) AS n_vocab_words
           |FROM g ORDER BY weighted_count DESC, pair LIMIT 10""".stripMargin,

      "q297_entry_exit" ->
        """WITH e AS (SELECT user_id, event_id, event_type,
          |                  CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec FROM events),
          |g AS (SELECT *, CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
          |               THEN 1 ELSE 0 END AS new_s
          |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
          |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
          |                                 ROWS UNBOUNDED PRECEDING) AS session_id
          |      FROM g),
          |fl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
          |                 ORDER BY sec, event_id) AS rf,
          |               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
          |                 ORDER BY sec DESC, event_id DESC) AS rl
          |       FROM s),
          |per AS (SELECT user_id, session_id, COUNT(*) AS n_events,
          |          MIN(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
          |          MIN(CASE WHEN rl = 1 THEN event_type END) AS exit_type
          |        FROM fl GROUP BY user_id, session_id)
          |SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
          |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
          |FROM per GROUP BY entry_type, exit_type
          |ORDER BY entry_type, exit_type""".stripMargin,

      "q298_shard_manifest" ->
        s"""WITH d AS (SELECT doc_id,
           |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_toks FROM documents),
           |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) - 1 AS r0
           |      FROM d),
           |sh AS (SELECT *, CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8
           |                      ELSE 7 - (r0 % 8) END AS shard FROM r),
           |per AS (SELECT shard, COUNT(*) AS n_docs, SUM(n_toks) AS sum_tokens
           |        FROM sh GROUP BY shard),
           |m AS (SELECT SUM(sum_tokens) // COUNT(*) AS mean_tokens FROM per)
           |SELECT CAST(shard AS BIGINT) AS shard, CAST(n_docs AS BIGINT) AS n_docs,
           |       CAST(sum_tokens AS BIGINT) AS sum_tokens,
           |       CAST((sum_tokens - mean_tokens) * 10000
           |            // GREATEST(mean_tokens, 1) AS BIGINT) AS dev_e4
           |FROM per, m ORDER BY shard""".stripMargin
    )
  }
}
