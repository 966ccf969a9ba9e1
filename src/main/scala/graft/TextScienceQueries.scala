package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions.{tokens, sqlTokens}

/** Text-science subsystem (round 10, fortieth wave): BPE merge
  * training, C4-style chunk-dedup REBUILD (the transform, not just the
  * audit), Zipf rank-frequency fit, and per-term burstiness.
  *
  * Reference intent: the reference has no text pipeline at all — these
  * are the operators a 100-TB training-data engine must add (SURVEY
  * §2.11). q333 demonstrates the engine can TRAIN a tokenizer, not
  * just count pairs (q296's statistics become three actual merge
  * rounds, each a deterministic argmax + an in-plan re-tokenization of
  * the vocabulary); q334 performs the C4/Dolma line-dedup transform at
  * chunk grain (this corpus has no newlines) and re-assembles the
  * surviving documents with checksums; q335 fits the Zipf exponent
  * from integer log2 bucket means; q336 measures Church-Gale
  * burstiness (variance-to-mean of per-doc term counts, zeros
  * included) — the statistic that separates topical terms from
  * function words.
  *
  * Scale shapes: BPE's corpus-scale work is ONE word-frequency
  * groupBy; every merge round then runs on the DISTINCT-WORD
  * vocabulary (weighted by corpus frequency), so 3 rounds cost 3
  * vocab-scale passes regardless of corpus size. The rebuild is one
  * posexplode + two chunk-grain shuffles. Zipf ranks the vocabulary
  * with contiguousIds (range-partitioned, no global window).
  */
object TextScienceQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** One BPE merge round: count adjacent symbol pairs weighted by word
    * frequency, pick the (freq desc, pair asc) argmax, and re-tokenize
    * every word by merging that pair leftmost-first non-overlapping —
    * the exact fold semantics of Sennrich et al.'s reference
    * implementation. Returns (merged words, the 1-row round stats). */
  private def bpeRound(w: DataFrame, round: Int): (DataFrame, DataFrame) = {
    val pairs = w.filter(size(col("sym")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(sym) - 1), i -> named_struct('a', element_at(sym, i), 'b', element_at(sym, i + 1)))")).as("p"))
      .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
      .agg(sum("freq").as("pf"))
    val best = pairs.orderBy(col("pf").desc, col("pa").asc, col("pb").asc).limit(1)
    // localCheckpoint: the merged vocab feeds the next round AND two
    // stats branches — lazily round r re-ran every earlier round's merge
    // fold (and the corpus tokenize) per branch (guide §3.3)
    val merged = w.crossJoin(broadcast(best))
      .withColumn("sym", expr(
        """aggregate(slice(sym, 2, size(sym) - 1), array(element_at(sym, 1)),
          |  (acc, s) -> case when element_at(acc, -1) = pa and s = pb
          |              then concat(slice(acc, 1, size(acc) - 1), array(concat(pa, pb)))
          |              else concat(acc, array(s)) end)""".stripMargin))
      .localCheckpoint()
    val after = merged.agg(
      sum(expr("freq * size(sym)")).as("total_symbols_after"))
    val vocabAfter = merged.select(explode(col("sym")).as("s"))
      .agg(countDistinct("s").as("distinct_symbols_after"))
    val stats = best
      .crossJoin(after).crossJoin(vocabAfter)
      .select(lit(round.toLong).as("round"), col("pa").as("pair_a"),
        col("pb").as("pair_b"), col("pf").as("pair_freq"),
        col("distinct_symbols_after"), col("total_symbols_after"))
    (merged.select("word", "freq", "sym"), stats)
  }

  /** DuckDB mirror of one BPE round as CTE text: w$r from w${r-1}. The
    * fold rides list_reduce with list-typed elements (acc and element
    * must share a type), seeded with the first symbol — q284's trick. */
  private def bpeRoundSql(r: Int): String = {
    val prev = s"w${r - 1}"
    s"""pr$r AS (SELECT UNNEST(list_transform(range(1, len(sym)), i -> [sym[i], sym[i+1]])) AS pr,
       |           freq FROM $prev WHERE len(sym) >= 2),
       |ag$r AS (SELECT pr[1] AS pa, pr[2] AS pb, CAST(SUM(freq) AS BIGINT) AS pf
       |         FROM pr$r GROUP BY 1, 2),
       |best$r AS (SELECT pa, pb, pf FROM ag$r ORDER BY pf DESC, pa, pb LIMIT 1),
       |w$r AS (SELECT word, freq,
       |          list_reduce([[sym[1]]] || list_transform(sym[2:], s -> [s]),
       |            (acc, el) -> CASE WHEN acc[-1] = pa AND el[1] = pb
       |                         THEN list_slice(acc, 1, len(acc) - 1) || [pa || pb]
       |                         ELSE acc || el END) AS sym
       |        FROM $prev, best$r),
       |st$r AS (SELECT CAST($r AS BIGINT) AS round, pa AS pair_a, pb AS pair_b, pf AS pair_freq,
       |           (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM
       |              (SELECT UNNEST(sym) AS s FROM w$r) u) AS distinct_symbols_after,
       |           (SELECT CAST(SUM(freq * len(sym)) AS BIGINT) FROM w$r) AS total_symbols_after
       |         FROM best$r)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G278: BPE merge training (3 rounds, corpus-weighted) ───────────
    "q333_bpe_merges" -> ((s, dir) => {
      // spread + localCheckpoint: the corpus tokenize otherwise runs in
      // the scan's one task, and round 1 reads the vocab twice
      val w0 = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .withColumn("sym", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .localCheckpoint()
      val (w1, s1) = bpeRound(w0, 1)
      val (w2, s2) = bpeRound(w1, 2)
      val (_, s3) = bpeRound(w2, 3)
      s1.unionByName(s2).unionByName(s3).orderBy("round")
    }),

    // ── G279: chunk-dedup rebuild (C4 line-dedup at chunk grain) ───────
    // Disjoint 25-token chunks, exact-dup removal keeping the globally
    // smallest (doc_id, chunk_id) instance, then documents re-assembled
    // from their surviving chunks IN ORDER. Per source the ledger
    // reports docs touched, chunk/token shrinkage, and the
    // order-independent md5_60-xor checksum of the rebuilt texts — the
    // transform is certified, not just counted. One posexplode is the
    // only corpus-token-scale step; dedup and rebuild are chunk-grain.
    "q334_chunk_dedup_rebuild" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      val chunks = toks
        .withColumn("chunk", expr("pos div 25"))
        .groupBy("doc_id", "source", "chunk")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), e -> e.tok), ' ')").as("ctext"),
          count(lit(1)).as("ctoks"))
        .withColumn("fp", md5(col("ctext")))
      val winners = chunks.groupBy("fp")
        .agg(min(struct(col("doc_id"), col("chunk"))).as("w"))
        .select(col("fp"), col("w.doc_id").as("wd"), col("w.chunk").as("wc"))
      val kept = chunks.join(winners, Seq("fp"))
        .filter(col("doc_id") === col("wd") && col("chunk") === col("wc"))
      val rebuilt = kept.groupBy("doc_id", "source")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(chunk, ctext))), e -> e.ctext), ' ')").as("rtext"),
          sum("ctoks").as("toks_after"), count(lit(1)).as("chunks_kept"))
      val before = chunks.groupBy("doc_id")
        .agg(count(lit(1)).as("chunks_total"), sum("ctoks").as("toks_before"))
      rebuilt.join(before, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("chunks_kept") < col("chunks_total"), 1L).otherwise(0L)).as("docs_changed"),
          sum("chunks_total").as("chunks_total"), sum("chunks_kept").as("chunks_kept"),
          sum("toks_before").as("tokens_before"), sum("toks_after").as("tokens_after"),
          expr("bit_xor(md5_60(rtext))").as("xor60_rebuilt"))
        .orderBy("source")
    }),

    // ── G280: Zipf rank-frequency fit (integer log2 buckets) ───────────
    // Vocabulary ranked by frequency (contiguousIds over a
    // range-partitioned sort — no global window), bucketed by
    // bit_length(rank) so bucket k holds ranks [2^(k-1), 2^k). The
    // Zipf exponent is the exact-OLS slope of (bucket index,
    // floor-log2 of the bucket's mean frequency) at e4 — an integer
    // estimate whose granularity (±1 per bucket from the floor-log)
    // is documented; it answers the only question the corpus health
    // check asks: is the tail power-law-ish (slope near -1) or
    // degenerate. Vocabulary-scale everywhere after one corpus scan.
    "q335_zipf_fit" -> ((s, dir) => {
      val freq = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
      val ranked = graft.ops.Relational.contiguousIds(
        freq.repartitionByRange(32, col("f").desc, col("tok").asc)
          .sortWithinPartitions(col("f").desc, col("tok").asc), "r0")
        .withColumn("rank", col("r0") + 1)
      val buckets = ranked
        .withColumn("bucket", expr("length(bin(rank))").cast(LongType))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_terms"), sum("f").as("sum_freq"))
        .withColumn("mean_freq", expr("sum_freq div n_terms"))
        .withColumn("log2_mean", expr("length(bin(mean_freq)) - 1").cast(LongType))
      val fit = buckets.agg(count(lit(1)).as("m"), sum("bucket").as("sx"),
          sum("log2_mean").as("sy"), sum(expr("bucket * log2_mean")).as("sxy"),
          sum(expr("bucket * bucket")).as("sxx"))
        .select(expr(sdiv("(m * sxy - sx * sy) * 10000", "(m * sxx - sx * sx)"))
          .as("slope_e4"))
      buckets.crossJoin(broadcast(fit))
        .select("bucket", "n_terms", "sum_freq", "mean_freq", "log2_mean", "slope_e4")
        .orderBy("bucket")
    }),

    // ── G281: term burstiness (Church–Gale variance-to-mean) ───────────
    // For the 50 highest-df terms: VMR of the per-document term count
    // WITH zero-docs included, from three corpus aggregates only
    // (df, Σtf, Σtf² plus the doc count): VMR = (N·Σtf² − T²)/(N·T).
    // VMR ≈ 1 is Poisson (function words / uniform noise); VMR ≫ 1 is
    // bursty (topical). At 1e12 docs the products move to
    // DECIMAL(38,0) exactly as q279 does; BIGINT is exact at every
    // test sf. One corpus scan; the top-50 pick is TakeOrdered.
    "q336_term_burstiness" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy("tok")
        .agg(count(lit(1)).as("df"), sum("tf").as("t_sum"),
          sum(expr("tf * tf")).as("t_sq"))
      val top = stats.orderBy(col("df").desc, col("tok").asc).limit(50)
      val nd = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      top.crossJoin(broadcast(nd))
        .select(col("tok"), col("df"), col("t_sum"),
          expr("df * 10000 div n_docs").as("doc_share_e4"),
          expr("(n_docs * t_sq - t_sum * t_sum) * 10000 div (n_docs * t_sum)").as("vmr_e4"))
        .orderBy("tok")
    })
  )

  private val toksSql = sqlTokens("text")

  def oracleSql: Map[String, String] = Map(

    "q333_bpe_merges" ->
      s"""WITH w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         |              list_transform(range(1, length(word) + 1), i -> word[i]) AS sym
         |            FROM (SELECT UNNEST($toksSql) AS word FROM documents) x
         |            GROUP BY word),
         |${bpeRoundSql(1)},
         |${bpeRoundSql(2)},
         |${bpeRoundSql(3)}
         |SELECT * FROM st1 UNION ALL SELECT * FROM st2 UNION ALL SELECT * FROM st3
         |ORDER BY round""".stripMargin,

    "q334_chunk_dedup_rebuild" ->
      s"""WITH t AS (SELECT doc_id, source, UNNEST($toksSql) AS tok,
         |             generate_subscripts($toksSql, 1) - 1 AS pos
         |           FROM documents),
         |chunks AS (SELECT doc_id, source, pos // 25 AS chunk,
         |             string_agg(tok, ' ' ORDER BY pos) AS ctext,
         |             CAST(COUNT(*) AS BIGINT) AS ctoks
         |           FROM t GROUP BY 1, 2, 3),
         |fp AS (SELECT *, md5(ctext) AS fp FROM chunks),
         |kept AS (SELECT * FROM
         |           (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
         |              ORDER BY doc_id, chunk) AS rk FROM fp) z
         |         WHERE rk = 1),
         |reb AS (SELECT doc_id, source,
         |          string_agg(ctext, ' ' ORDER BY chunk) AS rtext,
         |          CAST(SUM(ctoks) AS BIGINT) AS toks_after,
         |          CAST(COUNT(*) AS BIGINT) AS chunks_kept
         |        FROM kept GROUP BY 1, 2),
         |bef AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS chunks_total,
         |          CAST(SUM(ctoks) AS BIGINT) AS toks_before
         |        FROM chunks GROUP BY 1)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN chunks_kept < chunks_total THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
         |       CAST(SUM(chunks_total) AS BIGINT) AS chunks_total,
         |       CAST(SUM(chunks_kept) AS BIGINT) AS chunks_kept,
         |       CAST(SUM(toks_before) AS BIGINT) AS tokens_before,
         |       CAST(SUM(toks_after) AS BIGINT) AS tokens_after,
         |       bit_xor(CAST('0x' || substr(md5(rtext), 1, 15) AS BIGINT)) AS xor60_rebuilt
         |FROM reb JOIN bef USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,

    "q335_zipf_fit" ->
      s"""WITH f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
         |           FROM (SELECT UNNEST($toksSql) AS tok FROM documents) x GROUP BY tok),
         |r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rank FROM f),
         |b AS (SELECT CAST(length(bin(rank)) AS BIGINT) AS bucket,
         |        CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(f) AS BIGINT) AS sum_freq
         |      FROM r GROUP BY 1),
         |b2 AS (SELECT *, sum_freq // n_terms AS mean_freq,
         |         CAST(length(bin(sum_freq // n_terms)) - 1 AS BIGINT) AS log2_mean FROM b),
         |fit AS (SELECT CAST(${sdivSql(
              "(COUNT(*) * SUM(bucket * log2_mean) - SUM(bucket) * SUM(log2_mean)) * 10000",
              "(COUNT(*) * SUM(bucket * bucket) - SUM(bucket) * SUM(bucket))")} AS BIGINT) AS slope_e4
         |        FROM b2)
         |SELECT bucket, n_terms, sum_freq, mean_freq, log2_mean, slope_e4
         |FROM b2, fit ORDER BY bucket""".stripMargin,

    "q336_term_burstiness" ->
      s"""WITH tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |            FROM (SELECT doc_id, UNNEST($toksSql) AS tok FROM documents) x
         |            GROUP BY 1, 2),
         |st AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS t_sum,
         |         CAST(SUM(tf * tf) AS BIGINT) AS t_sq
         |       FROM tf GROUP BY tok),
         |top AS (SELECT * FROM st ORDER BY df DESC, tok LIMIT 50),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT tok, df, t_sum,
         |       df * 10000 // n_docs AS doc_share_e4,
         |       (n_docs * t_sq - t_sum * t_sum) * 10000 // (n_docs * t_sum) AS vmr_e4
         |FROM top, nd ORDER BY tok""".stripMargin
  )
}
