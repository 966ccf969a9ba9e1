package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.functions.VectorFunctions._

/** Corpus-audit operators: the verification layer a 100-TB curation
  * pipeline runs over its own dedup/clustering artifacts — asymmetric
  * containment (sub-document duplication the symmetric Jaccard filter
  * misses), sketch-accuracy audits (is the MinHash estimate trustworthy
  * enough to skip the verify stage?), cross-source vocabulary overlap,
  * inverted-file cohesion stats, and chunk-granular duplicate text.
  *
  * Reference intent: the reference has no audit layer at all — quality
  * is asserted by eyeballing Streamlit plots (services/web-ui/app/main.py
  * renders raw rows). Everything here is the distributed, oracled
  * re-expression of "is my corpus actually clean?". Same disciplines as
  * the rest of the repo: scaled-BIGINT scores, banded candidates (never
  * all-pairs), narrow rows through shuffles, broadcast for small sides.
  */
object AuditQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G37: asymmetric-containment dedup ──────────────────────────────
    // Containment C(A,B) = |A∩B| / |A| catches a short doc embedded in a
    // long one — a pair symmetric Jaccard scores low (union is dominated
    // by the long side) and a near-dup filter at j≥0.2 can admit twice.
    // Candidates come from the SAME materialized MinHash band snapshot as
    // q23 (equi-join on (band, bucket), never O(n²)); the verify join
    // shuffles narrow (doc, tok) rows. Reported: pairs where either
    // direction's containment ≥ 0.5 — the "one of these is inside the
    // other" list a curation run reviews before choosing which to keep.
    "q93_containment_dup" -> ((s, dir) => {
      val cand = graft.ops.Dedup.selfBandCandidates(
        TextQueries.sigTable(s, dir), "doc_id", Seq("b0", "b1"))
      graft.ops.Dedup.tokenOverlap(cand, TextQueries.tokRows(s, dir), "doc_a", "doc_b")
        .withColumn("cont_a_e6", expr("inter * 1000000 div na"))
        .withColumn("cont_b_e6", expr("inter * 1000000 div nb"))
        .filter(col("cont_a_e6") >= 500000 || col("cont_b_e6") >= 500000)
        .select("doc_a", "doc_b", "inter", "na", "nb", "cont_a_e6", "cont_b_e6")
        .orderBy("doc_a", "doc_b")
    }),

    // ── G38: MinHash sketch-accuracy audit ─────────────────────────────
    // How far off is the 8-position signature estimate from the exact
    // token Jaccard, on the pairs the pipeline actually kept? est =
    // matching-positions/8; the landed q23 pair table supplies the exact
    // j_e6. Error histogram in 0.05 buckets — the number that decides
    // whether a 100-TB run can skip the exact-verify stage (and its
    // token-row shuffle) for high-band-agreement pairs. Pure reuse of two
    // materialized snapshots + one broadcast-sized join: audit cost is
    // O(|pairs|), independent of corpus size.
    "q94_sketch_accuracy" -> ((s, dir) => {
      val sigs = TextQueries.sigTable(s, dir)
      val sigCols = (0 until 8).map(j => s"s$j")
      val a = sigs.select(col("doc_id").as("doc_a") +: sigCols.map(c => col(c).as(s"a_$c")): _*)
      val b = sigs.select(col("doc_id").as("doc_b") +: sigCols.map(c => col(c).as(s"b_$c")): _*)
      val matchExpr = sigCols
        .map(c => when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L))
        .reduce(_ + _)
      FeatureQueries.dupPairsTable(s, dir)
        .join(a, Seq("doc_a")).join(b, Seq("doc_b"))
        .withColumn("est_e6", matchExpr * lit(125000L))
        .withColumn("err_e6", abs(col("est_e6") - col("j_e6")))
        .withColumn("err_bucket", expr("err_e6 div 50000"))
        .groupBy("err_bucket")
        .agg(count(lit(1)).as("n_pairs"),
          min(col("err_e6")).as("min_err_e6"), max(col("err_e6")).as("max_err_e6"))
        .orderBy("err_bucket")
    }),

    // ── G39: cross-source vocabulary overlap ───────────────────────────
    // Pairwise vocabulary Jaccard between crawl sources — the corpus-
    // composition audit behind mixture decisions (two sources with ~1.0
    // vocabulary overlap are candidates for merging or deduping their
    // weights). Vocabularies reduce to distinct (source, token-hash)
    // rows — vocabulary-sized, tiny next to the corpus — and pairs meet
    // through an equi-join on xxhash64(tok): a FIXED-WIDTH 8-byte long
    // through the distinct and join shuffles instead of variable-length
    // token strings (VERDICT r5 "next" #5; 64-bit rather than a 32-bit
    // md5 prefix because a billion-token vocabulary would see birthday
    // collisions at 32 bits, and any collision silently merges two
    // tokens — at 64 bits the expected collision count stays ≪ 1 and
    // the oracle hash-gate would expose one). Per hash the pair fan-out
    // is bounded by sources², never corpus rows. One partial-agg
    // shuffle + one vocab-row join at any scale.
    "q95_vocab_overlap" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val vocab = TextQueries.tokRows(s, dir)
        .join(src, "doc_id")
        .select(col("source"), xxhash64(col("tok")).as("h")).distinct()
      val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
      vocab.as("x").join(vocab.as("y"),
          col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .select(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), Seq("src_b"))
        .withColumn("j_e6", expr("inter * 1000000 div (na + nb - inter)"))
        .select("src_a", "src_b", "inter", "na", "nb", "j_e6")
        .orderBy("src_a", "src_b")
    }),

    // ── G40: inverted-file cohesion stats ──────────────────────────────
    // Per-cell quality audit of q38's IVF coarse quantizer: vectors per
    // cell and the cosine-to-centroid distribution (scaled-BIGINT — the
    // r6-rounded cosine ×1e6 is an exact integer, so the sums are
    // order-independent). Skewed cells (hot n, low cohesion) are how an
    // IVF index degrades to brute force; this is the one-scan check.
    // Assignment is the same broadcast n×K pass as q38 — linear, no
    // shuffle beyond the final K-row aggregate.
    "q96_cluster_stats" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val seeds = e.filter(col("vec_id").between(1, 8))
        .select(col("vec_id").as("seed_id"), col("v").as("sv"))
      e.crossJoin(broadcast(seeds))
        .select(col("vec_id"), col("seed_id"),
          cosineR6(col("v"), col("sv")).as("seed_cos"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("seed_id"), col("seed_cos")),
          struct(col("seed_cos"), negate(col("seed_id")))).as("w"))
        .select(col("vec_id"), col("w.seed_id").as("cell"),
          round(col("w.seed_cos") * 1000000).cast(LongType).as("cos_e6"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          expr("sum(cos_e6) div count(1)").as("mean_cos_e6"),
          min(col("cos_e6")).as("min_cos_e6"), max(col("cos_e6")).as("max_cos_e6"))
        .orderBy("cell")
    }),

    // ── G41: chunk-granular duplicate text ─────────────────────────────
    // Duplicate 50-token windows ACROSS documents — the sub-document
    // twin of q21's whole-doc exact dedup, over q86's chunk manifest
    // (stride 25). Near-dup docs share long runs; this localizes them to
    // the exact repeated spans a pipeline would mask or drop. Chunks
    // reduce to md5 keys at the source, so the shuffle carries 32-hex
    // hashes — one groupBy at any corpus size.
    "q97_chunk_dedup" -> ((s, dir) => {
      chunkRows(s, dir).groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("chunk_md5")
    }),

    // ── G53: duplicated-span document filter ───────────────────────────
    // The doc-level verdict built on q97's chunk table: for each doc, the
    // fraction of its 50-token windows that also occur in ANOTHER doc —
    // the substring-duplication metric of Lee et al. 2022 ("Deduplicating
    // Training Data Makes Language Models Better", arXiv:2107.06499 §4):
    // whole-doc dedup (q21/q23) misses documents assembled from widely-
    // copied spans, and span-fraction ≥ 50% is the drop rule. Chunks
    // reduce to md5 at the source, the cross-doc frequency table is one
    // hash-keyed groupBy, and the verdict join is hash↔hash — 32-hex
    // keys through every shuffle, token arrays never leave the scan.
    "q108_dup_span_filter" -> ((s, dir) => {
      val chunks = chunkRows(s, dir)
      val freq = chunks.groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(freq, Seq("chunk_md5"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
        .withColumn("dup_frac_e4", expr("n_dup_chunks * 10000 div n_chunks"))
        .withColumn("verdict",
          when(col("dup_frac_e4") >= 5000, "drop").otherwise("keep"))
        .orderBy("doc_id")
    }),

    // ── G58: n-gram novelty vs the whole corpus ────────────────────────
    // Per-doc novelty: the fraction of a doc's distinct word-3-grams
    // that appear in NO other document — the "how much of this is new
    // text" curation score (a near-zero-novelty doc is boilerplate even
    // if no single pair-wise twin exists, which is why q23/q24's
    // pairwise filters can't see it). Reuses the memoized gram snapshot
    // (one tokenize+ngram scan per corpus); grams cross the shuffles as
    // xxhash64 longs (q95's fixed-width-key discipline — 64-bit so a
    // billion-gram corpus stays birthday-safe), the gram-frequency side
    // is one partial-agg groupBy, and the verdict join is long↔long.
    "q113_gram_novelty" -> ((s, dir) => {
      val rows = TextQueries.gramTable(s, dir)
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("h"))
        .distinct()
      val freq = rows.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      rows.join(freq, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("novelty_e4", expr("(n_grams - n_shared) * 10000 div n_grams"))
        .orderBy("doc_id")
    }),

    // ── G61: dup-graph degree distribution ─────────────────────────────
    // Structural audit of the near-dup pair graph (q23's materialized
    // table): per-doc degree, folded to a degree→count histogram. A
    // heavy-tailed degree distribution is the early warning that one
    // template document will collapse half the corpus into a single
    // q64 component (and that the CC join's hot key needs salting); the
    // histogram is how a 100-TB run sees that BEFORE running CC. Cost:
    // one union of the two pair endpoints + two tiny aggregates —
    // O(|pairs|), independent of corpus size.
    "q116_dup_degree" -> ((s, dir) => {
      val pairs = FeatureQueries.dupPairsTable(s, dir)
      val deg = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      deg.groupBy("degree")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
        .orderBy("degree")
    }),

    // ── G88: count-min sketch accuracy audit ───────────────────────────
    // The heavy-hitter sketch a 100-TB stream uses when exact per-key
    // counts can't fit: depth×width counter matrix (4×1024 here), each
    // row a different md5-derived hash, estimate = min over rows. Both
    // build and probe are deterministic integer arithmetic, so the audit
    // is oracle-exact: for the top-20 true heavy keys, estimate − exact
    // (never negative — CMS only overestimates). Build cost: the per-key
    // aggregate the pipeline already runs, then a depth-way explode of
    // |keys| rows into a d×W-cell aggregate (map-side combining to ≤4096
    // cells per mapper); probe cost: broadcast of the 4096-row sketch.
    // The audit that decides whether the sketch's ε·N bound is tight
    // enough to replace the exact count at scale.
    "q143_cms_accuracy" -> ((s, dir) => {
      val W = 1024
      val exact = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      val cells = exact
        .withColumn("r", explode(expr("sequence(0, 3)")))
        .withColumn("c",
          conv(substring(md5(concat(col("r").cast(StringType), lit(":"),
            col("user_id").cast(StringType))), 1, 8), 16, 10)
            .cast(LongType) % W)
        .groupBy("r", "c").agg(sum(col("n_exact")).as("cell_n"))
      val top = exact.orderBy(col("n_exact").desc, col("user_id")).limit(20)
      top.withColumn("r", explode(expr("sequence(0, 3)")))
        .withColumn("c",
          conv(substring(md5(concat(col("r").cast(StringType), lit(":"),
            col("user_id").cast(StringType))), 1, 8), 16, 10)
            .cast(LongType) % W)
        .join(broadcast(cells), Seq("r", "c"))
        .groupBy("user_id")
        .agg(min(col("n_exact")).as("n_exact"), min(col("cell_n")).as("n_est"))
        .withColumn("over_n", col("n_est") - col("n_exact"))
        .select("user_id", "n_exact", "n_est", "over_n")
        .orderBy("user_id")
    }),

    // ── G89: dup-graph triangle census ─────────────────────────────────
    // Global clustering structure of the near-dup graph: triangle count,
    // wedge count, and the global clustering coefficient 3·Δ/wedges —
    // the density signal that separates "chains of borderline pairs"
    // (CC will over-merge; low GCC) from "tight clique clusters" (safe
    // to collapse; high GCC). Shape is the degree-oriented algorithm
    // (Cohen 2009): orient every edge from the (degree, id)-smaller
    // endpoint, enumerate wedges only at each triangle's smallest-degree
    // apex, then close them against the undirected pair set — worst-case
    // O(|E|^1.5) candidate wedges instead of Σdeg² from the naive
    // neighbor self-join (the oracle keeps the naive a<b<c form: same
    // answer, which is the point). All joins are equi-joins on doc ids;
    // nothing here ever touches the corpus itself.
    "q146_dup_triangles" -> ((s, dir) => {
      val pairs = FeatureQueries.dupPairsTable(s, dir).select("doc_a", "doc_b")
      val deg = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      val da = deg.select(col("doc_id").as("doc_a"), col("degree").as("deg_a"))
      val db = deg.select(col("doc_id").as("doc_b"), col("degree").as("deg_b"))
      // orient: src = (degree, id)-smaller endpoint
      val oriented = pairs.join(da, "doc_a").join(db, "doc_b")
        .select(
          when(struct(col("deg_a"), col("doc_a")) < struct(col("deg_b"), col("doc_b")),
            col("doc_a")).otherwise(col("doc_b")).as("src"),
          when(struct(col("deg_a"), col("doc_a")) < struct(col("deg_b"), col("doc_b")),
            col("doc_b")).otherwise(col("doc_a")).as("dst"))
      val e1 = oriented.select(col("src"), col("dst").as("v"))
      val e2 = oriented.select(col("src"), col("dst").as("w"))
      val wedgesAtApex = e1.join(e2, "src").filter(col("v") < col("w"))
      val closing = pairs.select(
        least(col("doc_a"), col("doc_b")).as("v"),
        greatest(col("doc_a"), col("doc_b")).as("w"))
      val tri = wedgesAtApex.join(closing, Seq("v", "w"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      val stats = pairs.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(deg.agg(
          coalesce(sum(expr("degree * (degree - 1) div 2")), lit(0L)).as("n_wedges")))
      stats.crossJoin(tri)
        .withColumn("gcc_e6",
          when(col("n_wedges") > 0,
            expr("3 * n_triangles * 1000000 div n_wedges")).otherwise(lit(0L)))
        .select("n_pairs", "n_wedges", "n_triangles", "gcc_e6")
    })
  )

  /** Chunk manifest rows (doc_id, source, chunk_md5): every doc's
    * 50-token windows at stride 25, reduced to md5 at the scan (q86's
    * window shape). Shared by q97 (cross-doc duplicate spans), q108
    * (per-doc duplicated fraction) and q110 (chunk-level
    * decontamination) — one definition so the three stay congruent. */
  private[graft] def chunkRows(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .withColumn("start",
        explode(expr("sequence(0, greatest(cast(n - 26 as int), 0), 25)")))
      .select(col("doc_id"), col("source"),
        md5(expr("concat_ws(' ', slice(toks, start + 1, least(50, n - start)))"))
          .as("chunk_md5"))

  private val toks = sqlTokens("text")

  /** DuckDB mirror of [[chunkRows]] — CTE `c` = (doc_id, source, h).
    * Shared by the q97/q108 oracles here and q110's in CurationQueries. */
  private[graft] val chunkCte: String =
    s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
       |     n AS (SELECT doc_id, source, toks, CAST(len(toks) AS INT) AS n FROM t),
       |     s AS (SELECT doc_id, source, toks, n,
       |             CAST(UNNEST(range(0, GREATEST(n - 26, 0) + 1, 25)) AS INT) AS start
       |           FROM n),
       |     c AS (SELECT doc_id, source,
       |             md5(array_to_string(list_slice(toks, start + 1,
       |               start + LEAST(50, n - start)), ' ')) AS h
       |           FROM s)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q108_dup_span_filter" ->
      (chunkCte +
        s""",
           |f AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM c GROUP BY h),
           |j AS (SELECT c.doc_id, CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END AS dup
           |      FROM c JOIN f USING (h))
           |SELECT doc_id, COUNT(*) AS n_chunks,
           |       CAST(SUM(dup) AS BIGINT) AS n_dup_chunks,
           |       CAST(SUM(dup) * 10000 // COUNT(*) AS BIGINT) AS dup_frac_e4,
           |       CASE WHEN SUM(dup) * 10000 // COUNT(*) >= 5000
           |            THEN 'drop' ELSE 'keep' END AS verdict
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q143_cms_accuracy" ->
      s"""WITH e AS (SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id),
         |cells AS (
         |  SELECT r,
         |         CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
         |           CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS c,
         |         CAST(SUM(n_exact) AS BIGINT) AS cell_n
         |  FROM e CROSS JOIN range(4) t(r) GROUP BY 1, 2),
         |top AS (SELECT user_id, n_exact FROM e
         |        ORDER BY n_exact DESC, user_id LIMIT 20),
         |probe AS (
         |  SELECT t.user_id, t.n_exact, r,
         |         CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
         |           CAST(t.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS c
         |  FROM top t CROSS JOIN range(4) tr(r)),
         |est AS (SELECT p.user_id, MIN(p.n_exact) AS n_exact,
         |               MIN(cells.cell_n) AS n_est
         |        FROM probe p JOIN cells ON cells.r = p.r AND cells.c = p.c
         |        GROUP BY p.user_id)
         |SELECT user_id, n_exact, n_est, n_est - n_exact AS over_n
         |FROM est ORDER BY user_id""".stripMargin,

    "q146_dup_triangles" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p AS MATERIALIZED (SELECT doc_a, doc_b FROM ($q23)),
         |d AS (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p),
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM d GROUP BY doc_id),
         |tri AS (SELECT COUNT(*) AS n_triangles
         |        FROM p p1 JOIN p p2 ON p1.doc_b = p2.doc_a
         |                  JOIN p p3 ON p3.doc_a = p1.doc_a
         |                           AND p3.doc_b = p2.doc_b),
         |w AS (SELECT CAST(COALESCE(SUM(degree * (degree - 1) // 2), 0) AS BIGINT)
         |        AS n_wedges FROM deg),
         |np AS (SELECT COUNT(*) AS n_pairs FROM p)
         |SELECT n_pairs, n_wedges, n_triangles,
         |       CAST(CASE WHEN n_wedges > 0
         |            THEN 3 * n_triangles * 1000000 // n_wedges
         |            ELSE 0 END AS BIGINT) AS gcc_e6
         |FROM np, w, tri""".stripMargin
    },

    "q116_dup_degree" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p AS (SELECT * FROM ($q23)),
         |     d AS (SELECT doc_a AS doc_id FROM p
         |           UNION ALL SELECT doc_b FROM p),
         |     deg AS (SELECT doc_id, COUNT(*) AS degree FROM d GROUP BY doc_id)
         |SELECT degree, COUNT(*) AS n_docs, MIN(doc_id) AS example_doc
         |FROM deg GROUP BY degree ORDER BY degree""".stripMargin
    },

    "q113_gram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |     d AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
         |             i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) AS g
         |           FROM t WHERE len(toks) >= 3),
         |     r AS (SELECT doc_id, UNNEST(g) AS gram FROM d),
         |     f AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM r GROUP BY gram),
         |     j AS (SELECT r.doc_id, CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END AS sh
         |           FROM r JOIN f USING (gram))
         |SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(sh) AS BIGINT) AS n_shared,
         |       CAST((COUNT(*) - SUM(sh)) * 10000 // COUNT(*) AS BIGINT) AS novelty_e4
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q93_containment_dup" ->
      (TextQueries.sigCte +
        s""",
           |bands AS (SELECT doc_id, 0 AS band_id, b0 AS bucket FROM sigs
           |          UNION ALL SELECT doc_id, 1, b1 FROM sigs),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |         FROM bands x JOIN bands y
           |           ON x.band_id = y.band_id AND x.bucket = y.bucket
           |         WHERE x.doc_id < y.doc_id),
           |ts AS (SELECT doc_id, list_distinct($toks) AS ts FROM documents),
           |jj AS (SELECT doc_a, doc_b,
           |         len(list_intersect(a.ts, b.ts)) AS inter,
           |         len(a.ts) AS na, len(b.ts) AS nb
           |       FROM cand JOIN ts a ON doc_a = a.doc_id JOIN ts b ON doc_b = b.doc_id)
           |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           |       CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           |       CAST(inter * 1000000 // na AS BIGINT) AS cont_a_e6,
           |       CAST(inter * 1000000 // nb AS BIGINT) AS cont_b_e6
           |FROM jj
           |WHERE inter * 1000000 // na >= 500000 OR inter * 1000000 // nb >= 500000
           |ORDER BY doc_a, doc_b""".stripMargin),

    "q94_sketch_accuracy" -> {
      // the nested q23 copy's CTE names are suffixed: MATERIALIZED CTEs
      // (sigCte, since r11) are hoisted by DuckDB's binder, so a nested
      // `WITH shing AS MATERIALIZED ...` collides with the outer
      // sigCte's `shing` ("Duplicate alias" binder error)
      val q23 = Seq("shing", "hx", "raw", "sigs")
        .foldLeft(TextQueries.oracleSql("q23_minhash_dup_pairs")) {
          (sql, name) => sql.replace(name, name + "_q23")
        }
      val matches = (0 until 8)
        .map(j => s"(CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END)").mkString(" + ")
      TextQueries.sigCte +
        s""",
           |p AS (SELECT * FROM ($q23)),
           |e AS (SELECT p.j_e6, ($matches) * 125000 AS est_e6
           |      FROM p JOIN sigs a ON p.doc_a = a.doc_id
           |             JOIN sigs b ON p.doc_b = b.doc_id),
           |r AS (SELECT abs(est_e6 - j_e6) AS err_e6 FROM e)
           |SELECT CAST(err_e6 // 50000 AS BIGINT) AS err_bucket,
           |       COUNT(*) AS n_pairs,
           |       CAST(MIN(err_e6) AS BIGINT) AS min_err_e6,
           |       CAST(MAX(err_e6) AS BIGINT) AS max_err_e6
           |FROM r GROUP BY err_bucket ORDER BY err_bucket""".stripMargin
    },

    "q95_vocab_overlap" ->
      s"""WITH v AS (SELECT DISTINCT d.source, t.tok
         |           FROM (SELECT doc_id, UNNEST(list_distinct($toks)) AS tok
         |                 FROM documents) t
         |           JOIN documents d ON t.doc_id = d.doc_id),
         |     sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY source),
         |     i AS (SELECT x.source AS src_a, y.source AS src_b, COUNT(*) AS inter
         |           FROM v x JOIN v y ON x.tok = y.tok AND x.source < y.source
         |           GROUP BY x.source, y.source)
         |SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
         |       CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
         |       CAST(inter * 1000000 // (a.n + b.n - inter) AS BIGINT) AS j_e6
         |FROM i JOIN sz a ON src_a = a.source JOIN sz b ON src_b = b.source
         |ORDER BY src_a, src_b""".stripMargin,

    "q96_cluster_stats" -> {
      val cos = sqlCosineR6("v", "sv")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |     seeds AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id BETWEEN 1 AND 8),
         |     asg AS (SELECT vec_id, seed_id, $cos AS seed_cos,
         |               row_number() OVER (PARTITION BY vec_id
         |                 ORDER BY $cos DESC, seed_id) AS rn
         |             FROM e CROSS JOIN seeds),
         |     cells AS (SELECT vec_id, seed_id AS cell,
         |                 CAST(round(seed_cos * 1000000) AS BIGINT) AS cos_e6
         |               FROM asg WHERE rn = 1)
         |SELECT cell, COUNT(*) AS n,
         |       CAST(SUM(cos_e6) // COUNT(*) AS BIGINT) AS mean_cos_e6,
         |       MIN(cos_e6) AS min_cos_e6, MAX(cos_e6) AS max_cos_e6
         |FROM cells GROUP BY cell ORDER BY cell""".stripMargin
    },

    "q97_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |     n AS (SELECT doc_id, toks, CAST(len(toks) AS INT) AS n FROM t),
         |     s AS (SELECT doc_id, toks, n,
         |             CAST(UNNEST(range(0, GREATEST(n - 26, 0) + 1, 25)) AS INT) AS start
         |           FROM n),
         |     c AS (SELECT doc_id,
         |             md5(array_to_string(list_slice(toks, start + 1,
         |               start + LEAST(50, n - start)), ' ')) AS chunk_md5
         |           FROM s)
         |SELECT chunk_md5, COUNT(DISTINCT doc_id) AS n_docs,
         |       COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc
         |FROM c GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_md5""".stripMargin
  )
}
