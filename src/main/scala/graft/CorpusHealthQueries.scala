package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}

/** Corpus-health / concentration audits (round 10, twenty-sixth wave):
  * exact Gini coefficient and Lorenz curve of customer spend, a
  * Heaps-law vocabulary-growth curve over hash slices, and a per-source
  * dataset card (the datasheet a curation team publishes per corpus
  * component).
  *
  * Reference intent: the reference has no inequality or corpus-
  * composition telemetry at all — it aggregates sales uniformly
  * (services/web-ui/app/db_utils.py pulls raw rows). These are the
  * concentration/composition facts a 100-TB ingest publishes before
  * anyone trains on the data. House disciplines: scaled-BIGINT floor
  * division (documented DECIMAL swap where n² terms outgrow 2⁶³), id
  * tiebreaks, global ranks only via the scale-safe primitives.
  */
object CorpusHealthQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G224: exact Gini coefficient (spend concentration) ─────────────
    // Gini of per-customer revenue from the rank formula
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over spend ascending —
    // the global rank comes from contiguousIds on a range-partitioned
    // sort (partition-major ids ARE the sort order), so no per-row
    // global window ever runs. Σ i·xᵢ grows as n²·x̄ — past 2⁶³ by a
    // few thousand customers at cents scale — so the rank-weighted sum
    // and the final products run in DECIMAL(38,0) (exact to 38 digits,
    // mirrored by DuckDB's HUGEINT); `div` floors back to BIGINT.
    "q279_gini_spend" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("spend_c"))
      val ranked = graft.ops.Relational.contiguousIds(
        spend.repartitionByRange(32, col("spend_c").asc, col("o_custkey").asc)
          .sortWithinPartitions(col("spend_c").asc, col("o_custkey").asc), "r0")
      ranked.agg(count(lit(1)).as("n"), sum("spend_c").as("sx"),
          sum(expr("(r0 + 1) * cast(spend_c as decimal(38,0))")).as("s1"))
        .select(col("n"), col("sx"),
          expr("""(2 * s1 - (n + 1) * cast(sx as decimal(38,0))) * 1000000
                  div (cast(n as decimal(38,0)) * sx)""").as("gini_e6"))
    }),

    // ── G225: Lorenz curve by spend decile (share-of-total ladder) ─────
    // The curve behind the Gini: exact spend deciles via
    // distributedNtile (scale-safe NTILE), then per-decile share and
    // cumulative share of total at e6. The cumulative sum runs on the
    // TEN pre-aggregated decile rows via a triangular self-join —
    // no window, no allowlist entry, nothing corpus-shaped after the
    // ntile. The "bottom 50% holds X%" fact is read directly off d5.
    "q280_lorenz_deciles" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("spend_c"))
      val dec = graft.ops.Relational.distributedNtile(spend,
          Seq(col("spend_c").asc, col("o_custkey").asc), 10,
          spend.agg(count(lit(1)).as("n_total")), "decile")
        .groupBy(col("decile").cast(LongType).as("decile"))
        .agg(count(lit(1)).as("n_cust"), sum("spend_c").as("dec_c"))
      val tot = dec.agg(sum("dec_c").as("tot_c"))
      val cum = dec.select(col("decile").as("d2"), col("dec_c").as("c2"))
      dec.join(broadcast(cum), col("d2") <= col("decile"))
        .groupBy("decile", "n_cust", "dec_c")
        .agg(sum("c2").as("cum_c"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_cust"), col("dec_c"),
          expr("dec_c * 1000000 div tot_c").as("share_e6"),
          expr("cum_c * 1000000 div tot_c").as("cum_share_e6"))
        .orderBy("decile")
    }),

    // ── G226: Heaps-law vocabulary growth over hash slices ─────────────
    // How fast does vocabulary grow as the corpus grows? Docs land in
    // 10 deterministic md5 slices; a token's FIRST slice is one min
    // aggregate, so cumulative vocab at slice k = count(first_slice ≤
    // k) — the whole curve from ONE token scan + a 10-row triangular
    // join, never a re-scan per prefix. new_types/DELTA-tokens per
    // slice is the marginal-novelty rate a dedup pipeline watches for
    // saturation.
    "q281_vocab_growth" -> ((s, dir) => {
      val sliced = Tables.documents(s, dir)
        .select(expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 10")
            .as("slice"),
          tokens(col("text")).as("toks"))
      val toksBySlice = sliced.select(col("slice"), explode(col("toks")).as("tok"))
      val firstSlice = toksBySlice.groupBy("tok")
        .agg(min("slice").as("first_slice"))
        .groupBy("first_slice").agg(count(lit(1)).as("new_types"))
      val volume = toksBySlice.groupBy("slice")
        .agg(count(lit(1)).as("n_tokens"))
      val base = volume.join(firstSlice, col("first_slice") === col("slice"), "left")
        .select(col("slice"), col("n_tokens"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
      val cum = base.select(col("slice").as("s2"), col("n_tokens").as("t2"),
        col("new_types").as("v2"))
      base.join(broadcast(cum), col("s2") <= col("slice"))
        .groupBy("slice", "n_tokens", "new_types")
        .agg(sum("t2").as("cum_tokens"), sum("v2").as("cum_types"))
        .orderBy("slice")
    }),

    // ── G227: per-source dataset card (corpus datasheet) ───────────────
    // The one-row-per-source composition fact sheet: doc count, token
    // count + e6 share of corpus, mean length (e2 cents-of-a-char),
    // language census (distinct + majority lang with e6 share via a
    // partitioned argmax), and the exact in-source duplicate rate
    // (md5(text) grouped — the q21 discipline scoped per source). One
    // token scan + per-source aggregates; every number exact.
    "q282_dataset_card" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          size(tokens(col("text"))).cast(LongType).as("n_toks"),
          md5(col("text")).as("fp"))
      val bySource = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"))
      val langTop = d.groupBy("source", "lang").agg(count(lit(1)).as("nl"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("nl").desc, col("lang").asc)))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("nl").as("top_lang_docs"))
      val dups = d.groupBy("source", "fp").agg(count(lit(1)).as("nf"))
        .groupBy("source")
        .agg(sum(expr("nf - 1")).as("dup_docs"))
      val tot = bySource.agg(sum("n_tokens").as("tot_tokens"))
      bySource.join(langTop, Seq("source"))
        .join(dups, Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("n_tokens * 1000000 div tot_tokens").as("token_share_e6"),
          expr("sum_chars * 100 div n_docs").as("mean_chars_e2"),
          col("n_langs"), col("top_lang"),
          expr("top_lang_docs * 1000000 div n_docs").as("top_lang_share_e6"),
          col("dup_docs"))
        .orderBy("source")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q279_gini_spend" ->
      """WITH sp AS (SELECT o_custkey,
        |              SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_c
        |            FROM orders GROUP BY o_custkey),
        |r AS (SELECT spend_c,
        |        ROW_NUMBER() OVER (ORDER BY spend_c, o_custkey) AS rk FROM sp),
        |a AS (SELECT COUNT(*) AS n, SUM(spend_c) AS sx,
        |             SUM(rk * spend_c) AS s1 FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
        |       CAST((2*s1 - (n+1)*sx) * 1000000 // (n*sx) AS BIGINT) AS gini_e6
        |FROM a""".stripMargin,

    "q280_lorenz_deciles" ->
      """WITH sp AS (SELECT o_custkey,
        |              SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_c
        |            FROM orders GROUP BY o_custkey),
        |d AS (SELECT spend_c,
        |        CAST(NTILE(10) OVER (ORDER BY spend_c, o_custkey) AS BIGINT) AS decile
        |      FROM sp),
        |g AS (SELECT decile, COUNT(*) AS n_cust, SUM(spend_c) AS dec_c
        |      FROM d GROUP BY decile),
        |t AS (SELECT SUM(dec_c) AS tot_c FROM g),
        |c AS (SELECT g.decile, g.n_cust, g.dec_c, SUM(g2.dec_c) AS cum_c
        |      FROM g JOIN g g2 ON g2.decile <= g.decile
        |      GROUP BY g.decile, g.n_cust, g.dec_c)
        |SELECT decile, CAST(n_cust AS BIGINT) AS n_cust,
        |       CAST(dec_c AS BIGINT) AS dec_c,
        |       CAST(dec_c * 1000000 // tot_c AS BIGINT) AS share_e6,
        |       CAST(cum_c * 1000000 // tot_c AS BIGINT) AS cum_share_e6
        |FROM c, t ORDER BY decile""".stripMargin,

    "q281_vocab_growth" ->
      s"""WITH sliced AS (SELECT
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 10 AS slice,
         |    unnest(${sqlTokens("text")}) AS tok
         |  FROM documents),
         |fs AS (SELECT first_slice, COUNT(*) AS new_types
         |       FROM (SELECT tok, MIN(slice) AS first_slice FROM sliced GROUP BY tok)
         |       GROUP BY first_slice),
         |vol AS (SELECT slice, COUNT(*) AS n_tokens FROM sliced GROUP BY slice),
         |b AS (SELECT slice, n_tokens, COALESCE(new_types, 0) AS new_types
         |      FROM vol LEFT JOIN fs ON first_slice = slice)
         |SELECT b.slice, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |       CAST(b.new_types AS BIGINT) AS new_types,
         |       CAST(SUM(c.n_tokens) AS BIGINT) AS cum_tokens,
         |       CAST(SUM(c.new_types) AS BIGINT) AS cum_types
         |FROM b JOIN b c ON c.slice <= b.slice
         |GROUP BY b.slice, b.n_tokens, b.new_types
         |ORDER BY b.slice""".stripMargin,

    "q282_dataset_card" ->
      s"""WITH d AS (SELECT source, lang, n_chars,
         |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_toks,
         |    md5(text) AS fp
         |  FROM documents),
         |bs AS (SELECT source, COUNT(*) AS n_docs, SUM(n_toks) AS n_tokens,
         |              SUM(n_chars) AS sum_chars,
         |              COUNT(DISTINCT lang) AS n_langs
         |       FROM d GROUP BY source),
         |lt AS (SELECT source, lang AS top_lang, nl AS top_lang_docs
         |       FROM (SELECT source, lang, COUNT(*) AS nl,
         |               ROW_NUMBER() OVER (PARTITION BY source
         |                 ORDER BY COUNT(*) DESC, lang) AS rn
         |             FROM d GROUP BY source, lang)
         |       WHERE rn = 1),
         |dp AS (SELECT source, SUM(nf - 1) AS dup_docs
         |       FROM (SELECT source, fp, COUNT(*) AS nf FROM d GROUP BY source, fp)
         |       GROUP BY source),
         |t AS (SELECT SUM(n_tokens) AS tot_tokens FROM bs)
         |SELECT bs.source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(n_tokens * 1000000 // tot_tokens AS BIGINT) AS token_share_e6,
         |       CAST(sum_chars * 100 // n_docs AS BIGINT) AS mean_chars_e2,
         |       CAST(n_langs AS BIGINT) AS n_langs, top_lang,
         |       CAST(top_lang_docs * 1000000 // n_docs AS BIGINT) AS top_lang_share_e6,
         |       CAST(dup_docs AS BIGINT) AS dup_docs
         |FROM bs JOIN lt USING (source) JOIN dp USING (source), t
         |ORDER BY source""".stripMargin
  )
}
