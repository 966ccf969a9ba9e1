package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens, stopwordCount, sqlStopwordCount, EnStop}

/** Corpus-curation operators a 100-TB LLM-data pipeline runs after the
  * dedup/quality passes in [[TextQueries]]/[[FeatureQueries]]: repetition
  * filtering (Gopher-style), canonical-document selection per duplicate
  * cluster, stratified class rebalancing, TF-IDF term ranking,
  * benchmark-contamination detection, token-length histograms, and
  * phrase mining by lift.
  *
  * Reference intent: the reference's pandas prep collects rows and loops
  * on the driver (services/airflow/dags/task_operators.py:87-120); every
  * operator here is the distributed re-expression. All scores use the
  * repo-wide scaled-BIGINT discipline (exact in both engines, no float
  * accumulation order risk).
  */
object CurationQueries {

  /** Word 2-grams, NON-distinct (repetition counting needs multiplicity;
    * the `ngrams` kernel is distinct by design). Native codegen'd kernel —
    * the `transform(sequence(...), …)` lambda it replaces is
    * CodegenFallback (interpreted per element). Mirrored by [[sqlGrams2]]. */
  private def grams2(toks: org.apache.spark.sql.Column) =
    expr("ngrams_all(toks, 2)")

  /** DuckDB lists are 1-indexed; range(1, len) = 1..len-1 → len-1 grams,
    * same count and order as the Spark transform above. */
  private def sqlGrams2(toks: String): String =
    s"list_transform(range(1, len($toks)), i -> $toks[i] || ' ' || $toks[i+1])"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G22: Gopher-style repetition filter ────────────────────────────
    // Most-frequent-2-gram share of all 2-grams (the "repetition" signal
    // of the Gopher/MassiveText quality rules): a doc whose top bigram
    // exceeds 20% of its bigrams is flagged. Per-doc explode → two-level
    // agg; map-side partial combine keeps the shuffle at distinct
    // (doc, gram) cardinality. Embarrassingly parallel per doc at 100 TB.
    "q78_repetition_filter" -> ((s, dir) => {
      val g = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(grams2(col("toks"))).as("gram"))
      g.groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_grams"), max(col("cnt")).as("top_n"))
        .withColumn("top_ratio_e4", expr("top_n * 10000 div n_grams"))
        .withColumn("repetitive", col("top_ratio_e4") >= 2000)
        .orderBy("doc_id")
    }),

    // ── G23: canonical-document selection per duplicate cluster ────────
    // The step after clustering (q64): keep ONE representative per
    // near-dup component — longest text wins, doc_id breaks ties — the
    // policy real curation pipelines apply before writing the deduped
    // corpus. Reuses the materialized CC assignment (one CC run per
    // corpus snapshot); the window partitions by component, and dup
    // components are small by construction (banded LSH candidates), so
    // no hot partition at scale.
    "q79_canonical_docs" -> ((s, dir) => {
      val cc = FeatureQueries.componentsTable(s, dir)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val w = Window.partitionBy("comp")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      cc.join(docs, "doc_id")
        .withColumn("rn", row_number().over(w))
        .groupBy("comp")
        .agg(
          max(when(col("rn") === 1, col("doc_id"))).as("canonical_id"),
          max(when(col("rn") === 1, col("n_chars"))).as("kept_chars"),
          count(lit(1)).as("n_members"))
        .orderBy("comp")
    }),

    // ── G24: stratified class rebalancing ──────────────────────────────
    // Balanced downsample: every language keeps exactly m docs, where m
    // is the smallest class size — selection by md5(doc_id) rank, so the
    // sample is deterministic, uniform within stratum, and stable under
    // corpus growth (a doc's hash never changes). The per-lang window is
    // the honest cost at 100 TB (one shuffle on the stratum key); the
    // class-count aggregate is tiny and broadcast.
    "q80_stratified_rebalance" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast(StringType)).as("h"))
      val m = d.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("m"))
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      d.withColumn("rk", row_number().over(w).cast(LongType))
        .crossJoin(broadcast(m))
        .filter(col("rk") <= col("m"))
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy("lang", "doc_id")
    }),

    // ── G25: TF-IDF top-terms per document ─────────────────────────────
    // Integer tf-idf rank: score = tf * 1e6 div df (corpus size N is a
    // constant factor, irrelevant to ranking). Term→df is vocabulary-
    // sized — tiny next to the corpus — so the df side is broadcast;
    // the only big shuffles are the two aggregations, both with
    // map-side partial combine. Top-3 per doc via a doc-partitioned
    // window with a total tie-break (score, tf, term).
    "q81_tfidf_topk" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_e6").desc, col("tf").desc, col("tok").asc)
      tf.join(broadcast(df), "tok")
        .withColumn("score_e6", expr("tf * 1000000 div df"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score_e6"), col("rk"))
        .orderBy("doc_id", "rk")
    }),

    // ── G26: benchmark-contamination check ─────────────────────────────
    // Flag training docs sharing any word-3-gram with a held-out probe
    // set (here: source 'src0' stands in for the benchmark corpus) — the
    // n-gram-overlap decontamination step of GPT-3/PaLM data prep. Both
    // sides reduce to distinct 32-hex gram hashes, so the join carries
    // hashes, never gram text (the q68/q23 shuffle-bytes lesson); the
    // probe side is benchmark-sized → broadcast at real scale.
    "q82_contamination" -> ((s, dir) => {
      // reuse the materialized 3-gram snapshot (q24's fixture) — the
      // probe and corpus sides then cost one narrow parquet scan each
      // instead of two full tokenize+ngram passes
      val g = TextQueries.gramTable(s, dir)
        .select(col("doc_id"), col("source"), explode(col("g")).as("gram"))
        .select(col("doc_id"), col("source"), md5(col("gram")).as("h"))
      val probe = g.filter(col("source") === "src0").select("h").distinct()
      g.filter(col("source") =!= "src0")
        .join(broadcast(probe), "h")
        .groupBy("doc_id")
        .agg(countDistinct(col("h")).as("n_shared"))
        .orderBy("doc_id")
    }),

    // ── G27: token-length histogram ────────────────────────────────────
    // Fixed-width token-count histogram per language (the length-
    // distribution audit run before choosing packing/truncation params).
    // Closed bucket formula (width 10, capped at 15) — no data-dependent
    // bucket discovery job; one partial-agg shuffle at any scale.
    "q83_token_histogram" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
        .withColumn("bucket", expr("least(n_tokens div 10, 15)"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tokens")).as("min_toks"), max(col("n_tokens")).as("max_toks"))
        .orderBy("lang", "bucket")
    }),

    // ── G29: sequence packing (token-budget bins) ──────────────────────
    // Pack documents into fixed-token-budget training sequences (budget
    // 512): contiguous packing in doc_id order within each language — a
    // doc's bin is its *exclusive* running token total div 512. The
    // running sum is a per-stratum window (never a global single-
    // partition sort); bin stats aggregate with map-side combine. The
    // fill-ratio audit (tokens per bin / budget) is the packing-
    // efficiency number an LLM training run budgets against.
    "q85_sequence_packing" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"))
        .withColumn("run", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .withColumn("bin", expr("run div 512"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .withColumn("fill_e4", expr("bin_tokens * 10000 div 512"))
        .orderBy("lang", "bin")
    }),

    // ── G30: sliding-window chunking ───────────────────────────────────
    // Split every doc into 50-token windows with stride 25 (the context-
    // chunking step of RAG/pretraining prep). Chunk starts come from a
    // closed-form sequence — embarrassingly parallel per doc, no state;
    // the chunk text itself is a pure array slice. Output is the chunk
    // manifest (id, index, bounds, md5 of chunk text) — at 100 TB the
    // chunk text would be written, not collected; the manifest hash
    // proves the slice bit-exactly.
    "q86_chunk_windows" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n", size(col("toks")))
        .withColumn("start",
          explode(expr("sequence(0, greatest(cast(n - 26 as int), 0), 25)")))
        .withColumn("chunk_len", least(lit(50), col("n") - col("start")))
        .select(col("doc_id"),
          expr("cast(start div 25 as bigint)").as("chunk_idx"),
          col("start").cast(LongType).as("tok_start"),
          col("chunk_len").cast(LongType).as("chunk_len"),
          md5(expr("concat_ws(' ', slice(toks, start + 1, chunk_len))")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // ── G32: incremental corpus dedup (new batch vs existing) ──────────
    // The day-2 ingestion problem: admit an incoming batch (source
    // 'src9' stands in for today's crawl) only where it does NOT
    // near-duplicate the existing corpus. Asymmetric MinHash-band
    // equi-join — incoming × existing, never existing × existing — then
    // token-Jaccard verify on candidates only, shuffling narrow
    // (doc, tok) rows, not token arrays (q23's discipline). In a real
    // incremental run the existing side's signatures are the
    // materialized table from the last snapshot, so per-day cost scales
    // with |batch|, not |corpus|; recomputed here for oracle parity.
    "q88_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sigs = TextQueries.sigTable(s, dir)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      val bands = graft.ops.Dedup.bandTable(sigs, "doc_id", Seq("b0", "b1"),
        carryCols = Seq("source"))
      val inc = bands.filter(col("source") === "src9")
        .select(col("doc_id").as("new_id"), col("band_id"), col("bucket"))
      val exi = bands.filter(col("source") =!= "src9")
        .select(col("doc_id").as("old_id"), col("band_id"), col("bucket"))
      val cand = inc.join(exi, Seq("band_id", "bucket"))
        .select("new_id", "old_id").distinct()
      val dups = graft.ops.Dedup.tokenOverlap(
          cand, TextQueries.tokRows(s, dir), "new_id", "old_id")
        .withColumn("j_e6", expr("inter * 1000000 div (na + nb - inter)"))
        .filter(col("j_e6") >= 200000)
        .groupBy("new_id")
        .agg(count(lit(1)).as("n_dups"), max(col("j_e6")).as("best_j_e6"))
      docs.filter(col("source") === "src9").select(col("doc_id"))
        .join(dups.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("n_dups", coalesce(col("n_dups"), lit(0L)))
        .withColumn("admitted", col("n_dups") === 0)
        .select("doc_id", "n_dups", "best_j_e6", "admitted")
        .orderBy("doc_id")
    }),

    // ── G35: interval-overlap join ─────────────────────────────────────
    // Overlapping time-interval pairs (the media-segment/availability
    // shape): click vs view windows of 300 s per user. NOT a theta join
    // — each interval explodes to the fixed-width bins it covers and
    // pairs meet through a (user, bin) equi-join, then the exact overlap
    // predicate verifies candidates and dedup folds bin-duplicates. Bin
    // width = interval width caps the explode factor at 2; at 100 TB the
    // shuffle stays linear in event count, never |clicks|×|views|.
    "q91_interval_overlap" -> ((s, dir) => {
      val iv = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("s0"))
        .withColumn("e0", col("s0") + 300L)
      val binned = iv.withColumn("bin",
        explode(expr("sequence(s0 div 300, e0 div 300)")))
      val clicks = binned.filter(col("event_type") === "click")
        .select(col("user_id"), col("bin"), col("event_id").as("click_id"),
          col("s0").as("cs"), col("e0").as("ce"))
      val views = binned.filter(col("event_type") === "view")
        .select(col("user_id"), col("bin"), col("event_id").as("view_id"),
          col("s0").as("vs"), col("e0").as("ve"))
      clicks.join(views, Seq("user_id", "bin"))
        .filter(col("cs") < col("ve") && col("vs") < col("ce"))
        .select(col("user_id"), col("click_id"), col("view_id"),
          (least(col("ce"), col("ve")) - greatest(col("cs"), col("vs"))).as("overlap_sec"))
        .distinct()
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_overlaps"), sum(col("overlap_sec")).as("sum_overlap_sec"))
        .orderBy("user_id")
    }),

    // ── G36: distribution-outlier audit (exact z-score) ────────────────
    // Flag events beyond 3σ of their event_type's value distribution —
    // with NO floating-point moments: (x−μ)² > 9σ² rewritten as
    // (x·n − S)² > 9·(n·S2 − S²) over µ-scaled BIGINT values, DECIMAL(38)
    // sums. One aggregate pass + a broadcast join of 5 moment rows back
    // onto the scan; bit-identical verdicts in any engine. (DECIMAL(38)
    // holds to ~10⁹ rows/group at this value scale; beyond that the
    // pipeline shards the moment pass — same plan, grouped finer.)
    "q92_outlier_zscore" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val base = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 1000000).cast(LongType).as("v6"))
      val m = base.groupBy("event_type").agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("v6").cast(dec)).as("s"),
        sum(col("v6").cast(dec) * col("v6").cast(dec)).as("s2"))
      base.join(broadcast(m), "event_type")
        .withColumn("dev", col("v6").cast(dec) * col("n") - col("s"))
        .withColumn("is_out",
          col("dev") * col("dev") > lit(9) * (col("n") * col("s2") - col("s") * col("s")))
        .groupBy("event_type")
        .agg(max(col("n").cast(LongType)).as("n"),
          sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // ── G33: data-mixture sampling ─────────────────────────────────────
    // The "mixture weights" step of LLM corpus assembly: each source
    // keeps floor(weight × count) docs, chosen by md5(doc_id) rank —
    // deterministic, uniform within source, stable as sources grow. The
    // declared weight table is broadcast; ranking is one per-source
    // window; the manifest reports achieved counts and token budget.
    "q89_data_mixture" -> ((s, dir) => {
      import s.implicits._
      val weights = Seq(
        "src0" -> 10000L, "src1" -> 7500L, "src2" -> 5000L, "src3" -> 5000L,
        "src4" -> 2500L, "src5" -> 2500L, "src6" -> 2500L, "src7" -> 1000L,
        "src8" -> 1000L, "src9" -> 1000L).toDF("source", "w_e4")
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"),
          md5(col("doc_id").cast(StringType)).as("h"))
      val totals = d.groupBy("source").agg(count(lit(1)).as("n_total"))
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      d.withColumn("rk", row_number().over(w).cast(LongType))
        .join(broadcast(totals.join(weights, "source")), "source")
        .withColumn("n_keep", expr("n_total * w_e4 div 10000"))
        .filter(col("rk") <= col("n_keep"))
        .groupBy("source")
        .agg(max(col("n_total")).as("n_total"), max(col("n_keep")).as("n_keep"),
          sum(col("n_tokens")).as("kept_tokens"))
        .orderBy("source")
    }),

    // ── G34: duplicate-source matrix ───────────────────────────────────
    // Which crawls duplicate each other: near-dup pairs (q23's
    // materialized table) joined to both sides' sources, normalized so
    // (a,b) and (b,a) fold together, with pair counts and mean Jaccard.
    // Pure reuse of the landed pair snapshot — the audit costs two
    // narrow joins however big the corpus is.
    "q90_dup_source_matrix" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      FeatureQueries.dupPairsTable(s, dir)
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"), col("j_e6"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(j_e6) div count(1)").as("mean_j_e6"))
        .orderBy("src_a", "src_b")
    }),

    // ── G31: end-to-end corpus pipeline ────────────────────────────────
    // The whole curation chain as ONE declarative plan — quality gate
    // (q18's rule) ∘ canonical-per-dup-cluster (q79's policy) ∘
    // sequence packing (q85's bins) — producing the per-language corpus
    // manifest a training run consumes: docs kept, tokens, packed bins,
    // retention rate. Proves the operators compose without a driver
    // round-trip: the only scans are documents + the materialized CC
    // table, and every stage keys on lang/comp — no global sort, no
    // collect. This is the "switch your pipeline to one library call"
    // query for a user of the reference.
    "q87_corpus_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          stopwordCount(col("toks"), EnStop).cast(LongType).as("n_stop"))
      val wCanon = Window.partitionBy("comp")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val canonical = FeatureQueries.componentsTable(s, dir)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", row_number().over(wCanon))
        .filter(col("rn") === 1).select("doc_id")
      val kept = docs.join(canonical, "doc_id")
        .withColumn("stop_e4", expr("n_stop * 10000 div n_tokens"))
        .filter(col("n_tokens") >= 10 && col("stop_e4") >= 200)
      val wPack = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val packed = kept
        .withColumn("run", coalesce(sum(col("n_tokens")).over(wPack), lit(0L)))
        .withColumn("bin", expr("run div 512"))
      val perLang = packed.groupBy("lang").agg(
        count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"),
        (max(col("bin")) + 1).as("n_bins"))
      val totals = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n_total"))
      perLang.join(totals, "lang")
        .withColumn("pct_kept_e4", expr("n_kept * 10000 div n_total"))
        .select(col("lang"), col("n_total"), col("n_kept"), col("kept_tokens"),
          col("n_bins"), col("pct_kept_e4"))
        .orderBy("lang")
    }),

    // ── G28: phrase mining by lift ─────────────────────────────────────
    // Corpus-level collocations: top-20 word bigrams by lift
    // P(ab)/(P(a)P(b)) = cnt_ab * T / (cnt_a * cnt_b), scaled-BIGINT
    // (fits int64 up to ~10^7-token corpora; the 100-TB run promotes to
    // DECIMAL(38,0) — same plan). Unigram counts are vocabulary-sized →
    // broadcast to the bigram side; final top-20 is TakeOrdered, never a
    // global sort.
    "q84_phrase_lift" -> ((s, dir) => {
      val t = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
      val uni = t.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val total = uni.agg(sum(col("cnt")).as("t_total"))
      val bi = t.filter(size(col("toks")) >= 2)
        .select(explode(grams2(col("toks"))).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt_ab"))
        .filter(col("cnt_ab") >= 5)
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
      bi
        .join(broadcast(uni.select(col("tok").as("w1"), col("cnt").as("cnt_a"))), "w1")
        .join(broadcast(uni.select(col("tok").as("w2"), col("cnt").as("cnt_b"))), "w2")
        .crossJoin(broadcast(total))
        .withColumn("lift_e3", expr("cnt_ab * t_total * 1000 div (cnt_a * cnt_b)"))
        .select(col("gram"), col("cnt_ab"), col("cnt_a"), col("cnt_b"), col("lift_e3"))
        .orderBy(col("lift_e3").desc, col("gram").asc)
        .limit(20)
    }),

    // ── G54: snapshot diff (corpus data versioning) ────────────────────
    // What changed between two corpus snapshots — the audit every
    // incremental pipeline runs before promoting a new crawl: rows only
    // in the old snapshot (removed), only in the new (added), or in both
    // with different content hashes (changed). Snapshots here are
    // deterministic derivations of the documents table (old drops
    // doc_id%10=3, new drops %10=7 and rewrites %7=0 — all three change
    // classes non-empty at any SF). Content identity is md5 at the scan,
    // so ONE co-partitioned full-outer join on doc_id carries (id, hash)
    // pairs — never text. At 100 TB both snapshots are bucketed by
    // doc_id and the join is shuffle-free; unchanged rows die inside the
    // join stage, so the diff's output is proportional to the churn, not
    // the corpus.
    "q109_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val prev = d.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), md5(col("text")).as("old_h"))
      val next = d.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("new_h"))
      prev.join(next, Seq("doc_id"), "full_outer")
        .withColumn("change",
          when(col("old_h").isNull, "added")
            .when(col("new_h").isNull, "removed")
            .when(col("old_h") =!= col("new_h"), "changed")
            .otherwise("same"))
        .filter(col("change") =!= "same")
        .select("doc_id", "change", "old_h", "new_h")
        .orderBy("doc_id")
    }),

    // ── G55: Bloom-pruned benchmark decontamination ────────────────────
    // Drop every training doc that shares a 50-token window with the
    // held-out source (src7 stands in for the eval set) — chunk-granular
    // decontamination, the contamination-REMOVAL twin of q82's overlap
    // audit. The scale story is the join shape: the corpus's chunk
    // stream is pruned by a ~MB Bloom filter of the eval chunk hashes
    // (graft.ops.Bloom — Spark's own BloomFilterAggregate/
    // BloomFilterMightContain, composed deliberately rather than left to
    // InjectRuntimeFilter's cost model), so the corpus never shuffles:
    // only might-contain survivors pay the exact semi join, and the
    // verdict is provably identical to the plain join because a Bloom
    // filter has no false negatives (the oracle is that plain join).
    "q110_bloom_decontaminate" -> ((s, dir) => {
      val chunks = AuditQueries.chunkRows(s, dir)
      val block = chunks.filter(col("source") === "src7")
        .select(col("chunk_md5")).distinct()
      val contaminated = graft.ops.Bloom
        .semiJoin(chunks.filter(col("source") =!= "src7"), block, "chunk_md5")
        .select(col("doc_id")).distinct()
      Tables.documents(s, dir).filter(col("source") =!= "src7")
        .select(col("doc_id"), col("source"))
        .join(contaminated.withColumn("bad", lit(1L)), Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("bad").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
        .withColumn("n_kept", col("n_docs") - col("n_dropped"))
        .orderBy("source")
    }),

    // ── G56: median/MAD robust outliers ────────────────────────────────
    // The robust twin of q92's 3σ rule: |x − median| > 3·MAD flags
    // spikes without letting the spikes inflate their own threshold
    // (mean/σ break down exactly when outliers are present — one 10⁶×
    // spike drags σ until nothing else is an outlier). Exactness across
    // engines via the ×2 ladder: med2 = percentile(2·v6, 0.5) is
    // integral for any row count (midpoints of same-parity ints), dev2 =
    // |2·v6 − med2| is integral, mad4 = percentile(2·dev2, 0.5) is
    // integral again, and the verdict 2·dev2 > 3·mad4 is pure int64
    // compare — no float ever crosses an engine boundary. Two percentile
    // aggregates + two broadcast joins of the (tiny) per-type constants;
    // the events scan is never shuffled on anything but event_type.
    "q111_mad_outliers" -> ((s, dir) => {
      val v = Tables.events(s, dir)
        .select(col("event_type"), round(col("value") * 1000000).cast(LongType).as("v6"))
      val med = v.groupBy("event_type")
        .agg(expr("cast(percentile(v6 * 2, 0.5) as bigint)").as("med2"))
      val dev = v.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("v6") * 2 - col("med2")))
      val mad = dev.groupBy("event_type")
        .agg(expr("cast(percentile(dev2 * 2, 0.5) as bigint)").as("mad4"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(col("med2")).as("med_e6x2"),
          max(col("mad4")).as("mad_e6x4"),
          sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L)).as("n_outliers"),
          max(col("dev2")).as("max_dev_e6x2"))
        .orderBy("event_type")
    })
  )

  private val toks = sqlTokens("text")

  def oracleSql: Map[String, String] = Map(

    "q109_snapshot_diff" ->
      """WITH prev AS (SELECT doc_id, md5(text) AS old_h FROM documents
        |              WHERE doc_id % 10 <> 3),
        |     nxt AS (SELECT doc_id,
        |               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
        |                        ELSE text END) AS new_h
        |             FROM documents WHERE doc_id % 10 <> 7),
        |     j AS (SELECT COALESCE(prev.doc_id, nxt.doc_id) AS doc_id, old_h, new_h,
        |             CASE WHEN old_h IS NULL THEN 'added'
        |                  WHEN new_h IS NULL THEN 'removed'
        |                  WHEN old_h <> new_h THEN 'changed'
        |                  ELSE 'same' END AS change
        |           FROM prev FULL OUTER JOIN nxt ON prev.doc_id = nxt.doc_id)
        |SELECT doc_id, change, old_h, new_h FROM j
        |WHERE change <> 'same' ORDER BY doc_id""".stripMargin,

    "q110_bloom_decontaminate" ->
      (AuditQueries.chunkCte +
        s""",
           |b AS (SELECT DISTINCT h FROM c WHERE source = 'src7'),
           |bad AS (SELECT DISTINCT doc_id FROM c JOIN b USING (h)
           |        WHERE source <> 'src7')
           |SELECT d.source, COUNT(*) AS n_docs,
           |       CAST(SUM(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           |       CAST(COUNT(*) - SUM(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM documents d LEFT JOIN bad ON d.doc_id = bad.doc_id
           |WHERE d.source <> 'src7'
           |GROUP BY d.source ORDER BY d.source""".stripMargin),

    "q111_mad_outliers" ->
      """WITH s AS (SELECT event_type, CAST(round(value*1000000) AS BIGINT) AS v6
        |           FROM events),
        |     m AS (SELECT event_type,
        |             CAST(quantile_cont(v6 * 2, 0.5) AS BIGINT) AS med2
        |           FROM s GROUP BY event_type),
        |     d AS (SELECT s.event_type, v6, med2,
        |             ABS(v6 * 2 - med2) AS dev2
        |           FROM s JOIN m USING (event_type)),
        |     md AS (SELECT event_type,
        |              CAST(quantile_cont(dev2 * 2, 0.5) AS BIGINT) AS mad4
        |            FROM d GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n,
        |       MAX(med2) AS med_e6x2, MAX(mad4) AS mad_e6x4,
        |       CAST(SUM(CASE WHEN dev2 * 2 > mad4 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       MAX(dev2) AS max_dev_e6x2
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q78_repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |     g AS (SELECT doc_id, UNNEST(${sqlGrams2("toks")}) AS gram
         |           FROM t WHERE len(toks) >= 2),
         |     c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram),
         |     r AS (SELECT doc_id, SUM(cnt) AS n_grams, MAX(cnt) AS top_n
         |           FROM c GROUP BY doc_id)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(top_n AS BIGINT) AS top_n,
         |       CAST(top_n * 10000 // n_grams AS BIGINT) AS top_ratio_e4,
         |       top_n * 10000 // n_grams >= 2000 AS repetitive
         |FROM r ORDER BY doc_id""".stripMargin,

    "q79_canonical_docs" ->
      s"""${FeatureQueries.ccCte},
         |cc AS (SELECT id AS doc_id, lbl AS comp FROM l${FeatureQueries.CcRounds}),
         |j AS (SELECT cc.comp, cc.doc_id, d.n_chars,
         |        ROW_NUMBER() OVER (PARTITION BY cc.comp
         |          ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rn
         |      FROM cc JOIN documents d ON cc.doc_id = d.doc_id)
         |SELECT comp,
         |       MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
         |       MAX(CASE WHEN rn = 1 THEN n_chars END) AS kept_chars,
         |       COUNT(*) AS n_members
         |FROM j GROUP BY comp ORDER BY comp""".stripMargin,

    "q80_stratified_rebalance" ->
      """WITH d AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |     m AS (SELECT MIN(n) AS m FROM
        |             (SELECT COUNT(*) AS n FROM d GROUP BY lang)),
        |     r AS (SELECT doc_id, lang,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk
        |           FROM d)
        |SELECT lang, doc_id, rk FROM r, m WHERE rk <= m
        |ORDER BY lang, doc_id""".stripMargin,

    "q81_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, UNNEST($toks) AS tok FROM documents),
         |     tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
         |     df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |     j AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |             tf.tf * 1000000 // df.df AS score_e6
         |           FROM tf JOIN df ON tf.tok = df.tok),
         |     r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |             ORDER BY score_e6 DESC, tf DESC, tok ASC) AS BIGINT) AS rk FROM j)
         |SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |       CAST(score_e6 AS BIGINT) AS score_e6, rk
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q82_contamination" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
         |     d AS (SELECT doc_id, source,
         |             list_distinct(list_transform(range(1, len(toks)-1),
         |               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) AS g
         |           FROM t WHERE len(toks) >= 3),
         |     h AS (SELECT doc_id, source, md5(UNNEST(g)) AS h FROM d),
         |     probe AS (SELECT DISTINCT h FROM h WHERE source = 'src0')
         |SELECT c.doc_id, COUNT(DISTINCT c.h) AS n_shared
         |FROM h c JOIN probe p ON c.h = p.h
         |WHERE c.source <> 'src0'
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q83_token_histogram" ->
      s"""WITH t AS (SELECT lang, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |     b AS (SELECT lang, n_tokens, LEAST(n_tokens // 10, 15) AS bucket FROM t)
         |SELECT lang, bucket, COUNT(*) AS n_docs,
         |       MIN(n_tokens) AS min_toks, MAX(n_tokens) AS max_toks
         |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "q91_interval_overlap" ->
      """WITH iv AS (SELECT user_id, event_type, event_id,
        |       CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s0,
        |       CAST(epoch_ns(ts) // 1000000000 + 300 AS BIGINT) AS e0
        |     FROM events WHERE event_type IN ('click', 'view')),
        |b AS (SELECT user_id, event_type, event_id, s0, e0,
        |        UNNEST(range(s0 // 300, e0 // 300 + 1)) AS bin FROM iv),
        |c AS (SELECT user_id, bin, event_id AS click_id, s0 AS cs, e0 AS ce
        |      FROM b WHERE event_type = 'click'),
        |v AS (SELECT user_id, bin, event_id AS view_id, s0 AS vs, e0 AS ve
        |      FROM b WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT c.user_id, click_id, view_id,
        |        LEAST(ce, ve) - GREATEST(cs, vs) AS overlap_sec
        |      FROM c JOIN v ON c.user_id = v.user_id AND c.bin = v.bin
        |      WHERE cs < ve AND vs < ce)
        |SELECT user_id, COUNT(*) AS n_overlaps,
        |       CAST(SUM(overlap_sec) AS BIGINT) AS sum_overlap_sec
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q92_outlier_zscore" ->
      """WITH b AS (SELECT event_type, CAST(round(value*1000000) AS BIGINT) AS v6 FROM events),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(CAST(v6 AS HUGEINT)) AS s,
        |        SUM(CAST(v6 AS HUGEINT)*v6) AS s2 FROM b GROUP BY event_type)
        |SELECT b.event_type, CAST(MAX(m.n) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN (CAST(b.v6 AS HUGEINT)*m.n - m.s)*(CAST(b.v6 AS HUGEINT)*m.n - m.s)
        |                   > 9*(m.n*m.s2 - m.s*m.s) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM b JOIN m ON b.event_type = m.event_type
        |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,

    "q89_data_mixture" ->
      s"""WITH wt(source, w_e4) AS (VALUES
         |  ('src0', 10000), ('src1', 7500), ('src2', 5000), ('src3', 5000),
         |  ('src4', 2500), ('src5', 2500), ('src6', 2500), ('src7', 1000),
         |  ('src8', 1000), ('src9', 1000)),
         |d AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens,
         |        md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |t AS (SELECT source, COUNT(*) AS n_total FROM d GROUP BY source),
         |r AS (SELECT doc_id, source, n_tokens,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
         |      FROM d),
         |k AS (SELECT r.source, r.n_tokens, r.rk, t.n_total,
         |        t.n_total * wt.w_e4 // 10000 AS n_keep
         |      FROM r JOIN t ON r.source = t.source JOIN wt ON r.source = wt.source)
         |SELECT source, CAST(MAX(n_total) AS BIGINT) AS n_total,
         |       CAST(MAX(n_keep) AS BIGINT) AS n_keep,
         |       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
         |FROM k WHERE rk <= n_keep GROUP BY source ORDER BY source""".stripMargin,

    "q90_dup_source_matrix" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p2 AS (SELECT p.j_e6, a.source AS sa, b.source AS sb
         |  FROM ($q23) p
         |  JOIN documents a ON p.doc_a = a.doc_id
         |  JOIN documents b ON p.doc_b = b.doc_id),
         |n AS (SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b, j_e6 FROM p2)
         |SELECT src_a, src_b, COUNT(*) AS n_pairs,
         |       CAST(SUM(j_e6) // COUNT(*) AS BIGINT) AS mean_j_e6
         |FROM n GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin
    },

    "q88_incremental_dedup" ->
      (TextQueries.sigCte +
        s""",
           |src AS (SELECT s.doc_id, d.source, s.b0, s.b1
           |        FROM sigs s JOIN documents d ON s.doc_id = d.doc_id),
           |bands AS (SELECT doc_id, source, 0 AS band_id, b0 AS bucket FROM src
           |          UNION ALL SELECT doc_id, source, 1, b1 FROM src),
           |cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
           |         FROM bands x JOIN bands y
           |           ON x.band_id = y.band_id AND x.bucket = y.bucket
           |         WHERE x.source = 'src9' AND y.source <> 'src9'),
           |ts AS (SELECT doc_id, list_distinct($toks) AS ts FROM documents),
           |jj AS (SELECT new_id, old_id,
           |         len(list_intersect(a.ts, b.ts)) AS inter,
           |         len(a.ts) AS na, len(b.ts) AS nb
           |       FROM cand JOIN ts a ON new_id = a.doc_id JOIN ts b ON old_id = b.doc_id),
           |f AS (SELECT new_id, COUNT(*) AS n_dups,
           |        MAX(inter*1000000 // (na+nb-inter)) AS best
           |      FROM jj WHERE inter*1000000 // (na+nb-inter) >= 200000
           |      GROUP BY new_id)
           |SELECT d.doc_id, CAST(COALESCE(f.n_dups, 0) AS BIGINT) AS n_dups,
           |       CAST(f.best AS BIGINT) AS best_j_e6,
           |       COALESCE(f.n_dups, 0) = 0 AS admitted
           |FROM documents d LEFT JOIN f ON d.doc_id = f.new_id
           |WHERE d.source = 'src9' ORDER BY d.doc_id""".stripMargin),

    "q87_corpus_pipeline" ->
      s"""${FeatureQueries.ccCte},
         |cc AS (SELECT id AS doc_id, lbl AS comp FROM l${FeatureQueries.CcRounds}),
         |dq AS (SELECT doc_id, lang, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens,
         |         CAST(${sqlStopwordCount("toks", EnStop)} AS BIGINT) AS n_stop
         |       FROM (SELECT doc_id, lang, n_chars, $toks AS toks FROM documents)),
         |canon AS (SELECT doc_id FROM (
         |    SELECT cc.doc_id, ROW_NUMBER() OVER (PARTITION BY cc.comp
         |      ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rn
         |    FROM cc JOIN documents d ON cc.doc_id = d.doc_id) WHERE rn = 1),
         |kept AS (SELECT dq.* FROM dq JOIN canon ON dq.doc_id = canon.doc_id
         |         WHERE n_tokens >= 10 AND n_stop * 10000 // n_tokens >= 200),
         |r AS (SELECT lang, doc_id, n_tokens,
         |        COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
         |      FROM kept),
         |p AS (SELECT lang, doc_id, n_tokens, run // 512 AS bin FROM r),
         |a AS (SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
         |        CAST(MAX(bin) + 1 AS BIGINT) AS n_bins FROM p GROUP BY lang),
         |tot AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
         |SELECT a.lang, tot.n_total, a.n_kept, a.kept_tokens, a.n_bins,
         |       a.n_kept * 10000 // tot.n_total AS pct_kept_e4
         |FROM a JOIN tot ON a.lang = tot.lang ORDER BY a.lang""".stripMargin,

    "q85_sequence_packing" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |     r AS (SELECT doc_id, lang, n_tokens,
         |             COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
         |           FROM t),
         |     b AS (SELECT lang, doc_id, n_tokens, run // 512 AS bin FROM r),
         |     a AS (SELECT lang, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
         |             CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         |             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |           FROM b GROUP BY lang, bin)
         |SELECT lang, bin, n_docs, bin_tokens, first_doc, last_doc,
         |       CAST(bin_tokens * 10000 // 512 AS BIGINT) AS fill_e4
         |FROM a ORDER BY lang, bin""".stripMargin,

    "q86_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |     n AS (SELECT doc_id, toks, CAST(len(toks) AS INT) AS n FROM t),
         |     s AS (SELECT doc_id, toks, n,
         |             CAST(UNNEST(range(0, GREATEST(n - 26, 0) + 1, 25)) AS INT) AS start
         |           FROM n),
         |     c AS (SELECT doc_id, start, LEAST(50, n - start) AS chunk_len, toks FROM s)
         |SELECT doc_id, CAST(start // 25 AS BIGINT) AS chunk_idx,
         |       CAST(start AS BIGINT) AS tok_start, CAST(chunk_len AS BIGINT) AS chunk_len,
         |       md5(array_to_string(list_slice(toks, start + 1, start + chunk_len), ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q84_phrase_lift" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |     uni AS (SELECT UNNEST(toks) AS tok FROM t),
         |     u AS (SELECT tok, COUNT(*) AS cnt FROM uni GROUP BY tok),
         |     tot AS (SELECT SUM(cnt) AS t_total FROM u),
         |     big AS (SELECT UNNEST(${sqlGrams2("toks")}) AS gram
         |             FROM t WHERE len(toks) >= 2),
         |     b AS (SELECT gram, COUNT(*) AS cnt_ab FROM big GROUP BY gram
         |           HAVING COUNT(*) >= 5),
         |     j AS (SELECT b.gram, b.cnt_ab, a.cnt AS cnt_a, c.cnt AS cnt_b,
         |             b.cnt_ab * tot.t_total * 1000 // (a.cnt * c.cnt) AS lift_e3
         |           FROM b
         |           JOIN u a ON split_part(b.gram, ' ', 1) = a.tok
         |           JOIN u c ON split_part(b.gram, ' ', 2) = c.tok
         |           CROSS JOIN tot)
         |SELECT gram, CAST(cnt_ab AS BIGINT) AS cnt_ab, CAST(cnt_a AS BIGINT) AS cnt_a,
         |       CAST(cnt_b AS BIGINT) AS cnt_b, CAST(lift_e3 AS BIGINT) AS lift_e3
         |FROM j ORDER BY lift_e3 DESC, gram ASC LIMIT 20""".stripMargin
  )
}
