package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions.{tokens, sqlTokens}

/** Retrieval-infrastructure + lakehouse-read subsystem (round 10,
  * thirty-ninth wave): WAND max-score pruning safety, posting-list
  * delta-gap compression economics, deletion-vector merge-on-read
  * equivalence, and the as-of join semantics matrix.
  *
  * Reference intent: the reference serves forecasts out of Postgres
  * (services/forecast-service/app/main.py — point lookups only); a 100-TB
  * corpus needs the index machinery itself certified: WAND (Broder et
  * al. 2003) is WHY a top-k query can skip most postings, delta-gap
  * varints are WHY a posting list fits in cache, deletion vectors are
  * HOW a lake deletes without rewriting files (Delta/Iceberg
  * merge-on-read), and as-of joins are the feature-store lookup the
  * reference's latest-row join approximates (its streaming job's
  * blind latest-dim join is the bug q313 fixed; the matrix here pins
  * backward/forward/nearest semantics on event time).
  *
  * Scale shapes: q329/q330 ride the q221 posting explode (one corpus
  * shuffle, per-term windows); q331's merge-on-read is a positional
  * anti-join per file (the actual Delta read plan); q332's as-of is
  * the union-sort trick — tag both streams, ONE partitioned window
  * carries the last/next reference timestamp onto every probe, no
  * range join, no per-probe scan.
  */
object RetrievalLakeQueries {

  private val Terms = Seq("spark", "window", "merge")
  private val toksSql = sqlTokens("text")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G274: WAND max-score pruning audit ─────────────────────────────
    // Per term, the max-score upper bound UB_t = max over docs of that
    // term's BM25 contribution (q221's integer formula verbatim). A doc
    // whose term subset S has Σ UB_t < θ (θ = the 10th full score) can
    // be skipped without scoring — the WAND invariant. The audit groups
    // docs by their exact term subset and certifies, from data, that
    // (a) every subset's max realized score ≤ its UB sum (the bound
    // holds) and (b) every skippable subset's max score < θ (skipping
    // loses nothing). At 1e12 docs this is the difference between
    // scoring every posting and scoring ~k·|terms| of them.
    "q329_wand_pruning" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      val tf = toks.filter(col("tok").isin(Terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val contrib = tf
        .join(broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("idf_e6",
          expr("(1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1)"))
        .withColumn("tfsat_e6",
          expr("(1000000 * 22 * cast(tf as decimal(38,0)) * sum_dl) div (10 * cast(tf as decimal(38,0)) * sum_dl + 3*sum_dl + 9 * cast(dl as decimal(38,0)) * n_docs)"))
        .withColumn("contrib_e6", expr("idf_e6 * tfsat_e6 div 1000000"))
      val ub = contrib.groupBy("tok").agg(max("contrib_e6").as("ub_e6"))
      val doc = contrib.join(broadcast(ub), "tok")
        .groupBy("doc_id")
        .agg(concat_ws(",", sort_array(collect_set(col("tok")))).as("termset"),
          sum("contrib_e6").as("score_e6"), sum("ub_e6").as("doc_ub_e6"))
      val theta = doc.orderBy(col("score_e6").desc, col("doc_id").asc).limit(10)
        .agg(min("score_e6").as("theta_e6"))
      doc.groupBy("termset")
        .agg(count(lit(1)).as("n_docs"), min("doc_ub_e6").as("ub_sum_e6"),
          max("score_e6").as("max_score_e6"))
        .crossJoin(broadcast(theta))
        .select(col("termset"), col("n_docs"), col("ub_sum_e6"),
          col("max_score_e6"), col("theta_e6"),
          (col("ub_sum_e6") < col("theta_e6")).as("skippable"),
          (col("max_score_e6") <= col("ub_sum_e6")).as("bound_holds"),
          (col("ub_sum_e6") >= col("theta_e6") ||
            col("max_score_e6") < col("theta_e6")).as("skip_safe"))
        .orderBy("termset")
    }),

    // ── G275: posting-list delta-gap compression advisor ───────────────
    // For the 30 highest-df terms: encode each sorted posting list as
    // first-id + doc-id gaps, cost each gap at varint bytes (7 bits
    // per byte; the CASE ladder caps at 5 bytes = ids < 2^35, plenty
    // for any shard's doc space), and report bytes vs fixed 8-byte
    // encoding. The economics that decide index layout: high-df terms
    // have small gaps (dense postings compress hardest) — exactly the
    // terms that dominate index size. Per-term windows only; the
    // top-30 pick is df-ranked TakeOrdered, never a global sort.
    "q330_posting_compression" -> ((s, dir) => {
      val post = Tables.documents(s, dir)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      val dfc = post.groupBy("tok").agg(count(lit(1)).as("df"))
      val top = dfc.orderBy(col("df").desc, col("tok").asc).limit(30)
      val gaps = post.join(broadcast(top), "tok")
        .withColumn("prev", lag("doc_id", 1).over(
          Window.partitionBy("tok").orderBy("doc_id")))
        .withColumn("gap", expr("case when prev is null then doc_id else doc_id - prev end"))
        .withColumn("vbytes", expr(
          """case when gap < 128 then 1 when gap < 16384 then 2
            |     when gap < 2097152 then 3 when gap < 268435456 then 4
            |     else 5 end""".stripMargin))
      gaps.groupBy("tok")
        .agg(min("df").as("df"), sum("vbytes").as("bytes_var"),
          (min("df") * 8).as("bytes_fixed"), max("gap").as("max_gap"),
          expr("sum(gap) div count(1)").as("mean_gap"))
        .withColumn("ratio_e4", expr("bytes_var * 10000 div bytes_fixed"))
        .orderBy("tok")
    }),

    // ── G276: deletion-vector merge-on-read ≡ copy-on-write ────────────
    // Files are simulated as 256-key ranges of o_orderkey, positions
    // as the within-file rank — the (file, pos) address space a real
    // deletion vector indexes. An ~8% md5-picked delete set lands as a
    // position-delete table; the merge-on-read read is the positional
    // ANTI-JOIN of base against deletes (the actual Delta/Iceberg MoR
    // plan: file-local, no shuffle once co-partitioned by file), the
    // copy-on-write read filters the predicate directly. Per file the
    // audit certifies row-count AND order-independent md5_60-xor
    // checksum equality — the proof that the lake can defer rewrites.
    "q331_deletion_vectors" -> ((s, dir) => {
      val ranked = Tables.orders(s, dir)
        .select(col("o_orderkey"), expr("o_orderkey div 256").as("file_id"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("file_id").orderBy("o_orderkey")).cast(LongType))
        .withColumn("del", expr(
          "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 4), 16, 10) as bigint) % 100 < 8"))
      val dv = ranked.filter(col("del")).select("file_id", "pos")
      val mor = ranked.join(dv, Seq("file_id", "pos"), "left_anti")
        .groupBy("file_id").agg(count(lit(1)).as("n_mor"),
          expr("bit_xor(md5_60(cast(o_orderkey as string)))").as("xor_mor"))
      val cow = ranked.filter(!col("del"))
        .groupBy("file_id").agg(count(lit(1)).as("n_cow"),
          expr("bit_xor(md5_60(cast(o_orderkey as string)))").as("xor_cow"))
      val base = ranked.groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"), sum(when(col("del"), 1L).otherwise(0L)).as("n_deleted"))
      base.join(mor, Seq("file_id"), "left").join(cow, Seq("file_id"), "left")
        .na.fill(0L, Seq("n_mor", "n_cow"))
        .select(col("file_id"), col("n_rows"), col("n_deleted"),
          col("n_mor"), expr("n_deleted * 10000 div n_rows").as("deleted_share_e4"),
          (col("n_mor") === col("n_cow")).as("rows_match"),
          (col("xor_mor") <=> col("xor_cow")).as("checksum_match"))
        .orderBy("file_id")
    }),

    // ── G277: as-of join semantics matrix (backward/forward/nearest) ───
    // Every 'click' probe joins its user's 'view' stream under the
    // three as-of semantics, all from ONE union-sort pass per
    // direction: tag probes and references, sort within user by
    // (time, refs-first-on-tie, event_id), and a running MAX of the
    // reference timestamp carries the latest view ≤ each click
    // (backward); the reverse sort carries the earliest view ≥ each
    // click (forward); nearest picks the smaller |Δ| with ties to
    // backward. Refs-first tie order makes equality inclusive on both
    // sides. No range join, no per-probe scan — the merge_asof plan
    // that scales as one sort per user partition.
    "q332_asof_matrix" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
      val refs = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("us"), col("us").as("ref_us"),
          lit(0).as("is_probe"), col("event_id"))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"), lit(null).cast(LongType).as("ref_us"),
          lit(1).as("is_probe"), col("event_id"))
      val uni = refs.unionByName(probes)
      val wB = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("is_probe").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id")
        .orderBy(col("us").desc, col("is_probe").asc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val joined = uni
        .withColumn("bwd_us", max("ref_us").over(wB))
        .withColumn("fwd_us", min("ref_us").over(wF))
        .filter(col("is_probe") === 1)
        .select(col("user_id"), col("us"), col("bwd_us"), col("fwd_us"),
          expr("""case when bwd_us is null then fwd_us
                 |     when fwd_us is null then bwd_us
                 |     when us - bwd_us <= fwd_us - us then bwd_us
                 |     else fwd_us end""".stripMargin).as("near_us"))
      joined.select(explode(array(
          struct(lit("backward").as("semantics"), col("bwd_us").as("m_us")),
          struct(lit("forward").as("semantics"), col("fwd_us").as("m_us")),
          struct(lit("nearest").as("semantics"), col("near_us").as("m_us")))).as("e"),
          col("us"))
        .select(col("e.semantics").as("semantics"), col("e.m_us").as("m_us"), col("us"))
        .groupBy("semantics")
        .agg(count(lit(1)).as("n_probes"),
          count(col("m_us")).as("n_matched"),
          sum(abs(col("us") - col("m_us"))).as("sum_abs_delta_us"),
          max(abs(col("us") - col("m_us"))).as("max_abs_delta_us"))
        .orderBy("semantics")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q329_wand_pruning" ->
      s"""WITH x AS (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM x GROUP BY doc_id),
         |c AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM x
         |       WHERE tok IN ('spark','window','merge') GROUP BY doc_id, tok),
         |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id, tf.tok,
         |         ((1000000 * (2*c.n_docs - 2*df.df + 1)) // (2*df.df + 1))
         |           * ((1000000 * 22 * CAST(tf.tf AS HUGEINT) * c.sum_dl)
         |              // (10*CAST(tf.tf AS HUGEINT)*c.sum_dl + 3*c.sum_dl + 9*CAST(dl.dl AS HUGEINT)*c.n_docs))
         |           // 1000000 AS contrib_e6
         |       FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), c),
         |ub AS (SELECT tok, MAX(contrib_e6) AS ub_e6 FROM sc GROUP BY tok),
         |doc AS (SELECT doc_id,
         |          array_to_string(list(DISTINCT sc.tok ORDER BY sc.tok), ',') AS termset,
         |          CAST(SUM(contrib_e6) AS BIGINT) AS score_e6,
         |          CAST(SUM(ub_e6) AS BIGINT) AS doc_ub_e6
         |        FROM sc JOIN ub USING (tok) GROUP BY doc_id),
         |th AS (SELECT MIN(score_e6) AS theta_e6 FROM
         |         (SELECT score_e6 FROM doc ORDER BY score_e6 DESC, doc_id LIMIT 10) t)
         |SELECT termset, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       MIN(doc_ub_e6) AS ub_sum_e6, MAX(score_e6) AS max_score_e6,
         |       theta_e6,
         |       MIN(doc_ub_e6) < theta_e6 AS skippable,
         |       MAX(score_e6) <= MIN(doc_ub_e6) AS bound_holds,
         |       MIN(doc_ub_e6) >= theta_e6 OR MAX(score_e6) < theta_e6 AS skip_safe
         |FROM doc, th GROUP BY termset, theta_e6
         |ORDER BY termset""".stripMargin,

    "q330_posting_compression" ->
      s"""WITH post AS (SELECT DISTINCT doc_id, tok FROM
         |         (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents) x),
         |dfc AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok),
         |top AS (SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT 30),
         |g AS (SELECT post.tok, df,
         |        doc_id - LAG(doc_id) OVER (PARTITION BY post.tok ORDER BY doc_id) AS lg,
         |        doc_id
         |      FROM post JOIN top USING (tok)),
         |v AS (SELECT tok, df, COALESCE(lg, doc_id) AS gap,
         |        CASE WHEN COALESCE(lg, doc_id) < 128 THEN 1
         |             WHEN COALESCE(lg, doc_id) < 16384 THEN 2
         |             WHEN COALESCE(lg, doc_id) < 2097152 THEN 3
         |             WHEN COALESCE(lg, doc_id) < 268435456 THEN 4
         |             ELSE 5 END AS vbytes
         |      FROM g)
         |SELECT tok, CAST(MIN(df) AS BIGINT) AS df,
         |       CAST(SUM(vbytes) AS BIGINT) AS bytes_var,
         |       CAST(MIN(df) * 8 AS BIGINT) AS bytes_fixed,
         |       CAST(MAX(gap) AS BIGINT) AS max_gap,
         |       CAST(SUM(gap) // COUNT(*) AS BIGINT) AS mean_gap,
         |       CAST(SUM(vbytes) * 10000 // (MIN(df) * 8) AS BIGINT) AS ratio_e4
         |FROM v GROUP BY tok ORDER BY tok""".stripMargin,

    "q331_deletion_vectors" ->
      """WITH ranked AS (SELECT o_orderkey, o_orderkey // 256 AS file_id,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey // 256
        |           ORDER BY o_orderkey) AS BIGINT) AS pos,
        |         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT)
        |           % 100 < 8 AS del,
        |         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |       FROM orders),
        |dv AS (SELECT file_id, pos FROM ranked WHERE del),
        |mor AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_mor,
        |          bit_xor(h) AS xor_mor
        |        FROM ranked ANTI JOIN dv USING (file_id, pos)
        |        GROUP BY file_id),
        |cow AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_cow,
        |          bit_xor(h) AS xor_cow
        |        FROM ranked WHERE NOT del GROUP BY file_id),
        |base AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |           CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        |         FROM ranked GROUP BY file_id)
        |SELECT base.file_id, n_rows, n_deleted,
        |       COALESCE(n_mor, 0) AS n_mor,
        |       n_deleted * 10000 // n_rows AS deleted_share_e4,
        |       COALESCE(n_mor, 0) = COALESCE(n_cow, 0) AS rows_match,
        |       xor_mor IS NOT DISTINCT FROM xor_cow AS checksum_match
        |FROM base LEFT JOIN mor USING (file_id) LEFT JOIN cow USING (file_id)
        |ORDER BY file_id""".stripMargin,

    "q332_asof_matrix" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |uni AS (SELECT user_id, us, us AS ref_us, 0 AS is_probe, event_id
        |        FROM ev WHERE event_type = 'view'
        |        UNION ALL
        |        SELECT user_id, us, NULL, 1, event_id
        |        FROM ev WHERE event_type = 'click'),
        |j AS (SELECT user_id, us, is_probe,
        |        MAX(ref_us) OVER (PARTITION BY user_id
        |          ORDER BY us ASC, is_probe ASC, event_id ASC
        |          ROWS UNBOUNDED PRECEDING) AS bwd_us,
        |        MIN(ref_us) OVER (PARTITION BY user_id
        |          ORDER BY us DESC, is_probe ASC, event_id DESC
        |          ROWS UNBOUNDED PRECEDING) AS fwd_us
        |      FROM uni),
        |p AS (SELECT user_id, us, bwd_us, fwd_us,
        |        CASE WHEN bwd_us IS NULL THEN fwd_us
        |             WHEN fwd_us IS NULL THEN bwd_us
        |             WHEN us - bwd_us <= fwd_us - us THEN bwd_us
        |             ELSE fwd_us END AS near_us
        |      FROM j WHERE is_probe = 1),
        |lng AS (SELECT 'backward' AS semantics, bwd_us AS m_us, us FROM p
        |        UNION ALL SELECT 'forward', fwd_us, us FROM p
        |        UNION ALL SELECT 'nearest', near_us, us FROM p)
        |SELECT semantics, CAST(COUNT(*) AS BIGINT) AS n_probes,
        |       CAST(COUNT(m_us) AS BIGINT) AS n_matched,
        |       CAST(SUM(ABS(us - m_us)) AS BIGINT) AS sum_abs_delta_us,
        |       CAST(MAX(ABS(us - m_us)) AS BIGINT) AS max_abs_delta_us
        |FROM lng GROUP BY semantics ORDER BY semantics""".stripMargin
  )
}
