package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{asDouble, cosineR6, sqlCosineR6}
import graft.ops.Relational.boundedGlobalRank

/** RAG/retrieval-ops wave (round 11): the three ops a retrieval tier
  * runs between the index and the context window.
  *
  * Reference intent — every query names its consumer (r10 verdict
  * "next" #4):
  *  - q537: MMR re-ranking (Carbonell & Goldstein 1998), THE standard
  *    diversification pass between "top-k by similarity" and "what
  *    actually goes in the context window": greedily pick argmax of
  *    λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s), λ=0.7, k=10 from the
  *    top-20 shortlist. Consumer: q530's context packing (it packs a
  *    RANKED list — MMR is the stage that de-redundifies that list;
  *    without it near-dup chunks crowd out coverage). Scale shape:
  *    one corpus scan lands the shortlist (TakeOrdered, linear); the
  *    greedy runs on the R-row shortlist — R is the knob (20 here,
  *    ~1000 in production), never the corpus.
  *  - q538: ERR — expected reciprocal rank (Chapelle et al. CIKM'09),
  *    the cascade-model metric: a user scans down and stops at the
  *    first satisfying result with prob R(g). Completes the ranking-
  *    eval family (q276 nDCG and q525 are position-discount metrics;
  *    ERR is the stop-model one the cascade literature graded dense
  *    retrieval with). Graded qrels from the label hierarchy (exact
  *    label = 2, same label-pair = 1). EXACT rationals: (1−R) ∈
  *    {1, 3/4, 1/4}, so the prefix product is 3^a/4^(a+b) with
  *    (a, b) two window COUNTS — closed form per rank, no sequential
  *    fold, powers from pinned literal tables.
  *  - q539: DSIR importance weights (Xie et al., NeurIPS 2023) — the
  *    data-selection standard: score every raw doc by how much its
  *    hashed-unigram profile looks like the target domain,
  *    w(d) = Σ_tok [ln p_tgt(bucket) − ln p_raw(bucket)], then keep
  *    the top of the raw pool. Target = the 'en' slice; 4096 md5
  *    buckets (q202's hashing idiom); shares +1-Laplace-smoothed e6
  *    (q534's discipline); ln via the shared exact fixed-point kernel
  *    graft.ops.FixedLn — its second consumer, the reason it is a
  *    kernel and not a query-local trick. Consumer: q89's mixture
  *    sampling — DSIR weights are what turn "sample by source" into
  *    "sample toward the domain the model needs".
  *
  * House rules: exact integers (e6 shares, e9 logs), sign-explicit
  * div for signed sums, per-key windows only, totally ordered outputs.
  */
object RagOpsQueries {

  private val ShortlistR = 20
  private val MmrK = 10

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** 3^k and 4^k literal tables, k = 0..20 — exact integer powers in
    * both engines (element k+1). */
  private val Pow3 = (0 to 20).map(k => BigInt(3).pow(k).toLong)
  private val Pow4 = (0 to 20).map(k => BigInt(4).pow(k).toLong)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G482: MMR re-ranking of the dense-retrieval shortlist ──────────
    // Shortlist: top-20 by cosineR6 to query vec 0 (rank idx 1..20 by
    // cos desc, vec asc). Greedy k=10 as ONE aggregate fold over the
    // collected shortlist row: score_e7(i) = 7·rel6(i) − 3·max_{s∈sel}
    // c6(i,s); argmax by (score, lower idx) via struct max. All
    // integers; the 20×20 c6 matrix comes from a 400-row self-join.
    "q537_mmr_rerank" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qe"))
      // shortlist with rank index 1..R; the window is over the LIMITed
      // 20 rows (WindowSweepSpec's size-argued exception, q221's shape)
      val short = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("v"), cosineR6(col("v"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(ShortlistR)
        .withColumn("i", row_number().over(
          boundedGlobalRank(col("cos_r").desc, col("vec_id"))).cast("int"))
        .withColumn("rel6", expr("cast(round(cos_r * 1000000) as bigint)"))
      // 20×20 c6 matrix rows: sims(ia) ordered by ib
      val pairs = short.select(col("i").as("ia"), col("v").as("va"))
        .crossJoin(short.select(col("i").as("ib"), col("v").as("vb")))
        .withColumn("cr", cosineR6(col("va"), col("vb")))
        .withColumn("c6", expr("cast(round(cr * 1000000) as bigint)"))
      val mrows = pairs.groupBy("ia")
        .agg(expr("transform(array_sort(collect_list(struct(ib, c6))), " +
          "x -> x.c6)").as("sims"))
      // one row: cand(i) = (vec_id, rel6, sims), i = array position
      val one = short.join(mrows, col("i") === col("ia"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(i, vec_id, rel6, sims))), " +
          "x -> named_struct('rel6', x.rel6, 'sims', x.sims))").as("cand"))
      // greedy fold: acc elements are (sc, ni) with ni = -i, so struct
      // max picks (score desc, index asc) and i recovers as -ni
      val folded = one.withColumn("sel", expr(
        s"""aggregate(sequence(1, $MmrK),
           |  cast(array() as array<struct<sc: bigint, ni: int>>),
           |  (acc, step) -> array_append(acc,
           |    array_max(transform(
           |      filter(sequence(1, $ShortlistR),
           |             i -> size(filter(acc, a -> a.ni = -i)) = 0),
           |      i -> named_struct(
           |        'sc', 7 * element_at(cand, i).rel6 - 3 * coalesce(
           |          array_max(transform(acc,
           |            a -> element_at(element_at(cand, i).sims, -a.ni))), 0L),
           |        'ni', -i)))))""".stripMargin))
      folded.select(posexplode(col("sel")).as(Seq("pos", "p")))
        .select((col("pos") + 1).cast("long").as("rank"),
          expr("-p.ni").as("i"), col("p.sc").as("score_e7"))
        .join(short.select(col("i"), col("vec_id"), col("rel6").as("rel_c6")),
          Seq("i"))
        .select("rank", "vec_id", "rel_c6", "score_e7")
        .orderBy("rank")
    }),

    // ── G483: ERR — cascade-model ranking quality, closed form ─────────
    "q538_err_cascade" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          asDouble(col("embedding")).as("v"))
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qe"))
      val ranked = e.filter(col("vec_id") >= 8)
        .crossJoin(broadcast(qs))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          cosineR6(col("v"), col("qe")).as("cos_r"))
        .withColumn("rn", row_number().over(Window.partitionBy("qid")
          .orderBy(col("cos_r").desc, col("vec_id"))))
        .filter(col("rn") <= 20)
        .withColumn("g", expr("case when label = qlabel then 2L " +
          "when label div 2 = qlabel div 2 then 1L else 0L end"))
      val w = Window.partitionBy("qid").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
      val terms = ranked
        .withColumn("c34", count(when(col("g") === 1L, 1)).over(w))
        .withColumn("c14", count(when(col("g") === 2L, 1)).over(w))
        .withColumn("rnum", expr("case when g = 2 then 3L " +
          "when g = 1 then 1L else 0L end"))
        .withColumn("p3", element_at(typedLit(Pow3), col("c34").cast("int") + 1))
        .withColumn("p4", element_at(typedLit(Pow4),
          (col("c34") + col("c14")).cast("int") + 2))
        .withColumn("term_e9", expr("(rnum * p3 * 1000000000) div (p4 * rn)"))
      terms.groupBy("qid", "qlabel")
        .agg(sum("term_e9").as("err_e9"),
          sum(when(col("g") > 0L, 1L).otherwise(0L)).as("n_rel20"),
          coalesce(min(when(col("g") > 0L, col("rn"))), lit(-1L))
            .cast("long").as("first_rel_rank"))
        .orderBy("qid")
    }),

    // ── G484: DSIR hashed-unigram importance weights ───────────────────
    "q539_dsir_weights" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .withColumn("b", expr(
          "cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % 4096"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("tc"))
      val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
      val tots = raw.agg(sum("rc").as("rtot")).crossJoin(
        tgt.agg(sum("tc").as("ttot")))
      // bucket table: 4096 rows of smoothed e6 shares and the signed
      // fixed-point log ratio — node-sized metadata, broadcast to the
      // token join
      val shares = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("tc"))
        .crossJoin(broadcast(tots))
        .withColumn("p", expr("greatest(1L, (tc + 1) * 1000000 div (ttot + 4096))"))
        .withColumn("q", expr("greatest(1L, (rc + 1) * 1000000 div (rtot + 4096))"))
        .withColumn("hi", greatest(col("p"), col("q")))
        .withColumn("lo", least(col("p"), col("q")))
      val lw = graft.ops.FixedLn.lnE9(shares, "hi", "lo", "lnhl")
        .withColumn("lr_e9", expr("case when p >= q then lnhl else -lnhl end"))
        .select("b", "lr_e9")
      toks.join(broadcast(lw), Seq("b"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"), sum("lr_e9").as("w_sum_e9"))
        .withColumn("w_e9", expr(sdiv("w_sum_e9", "n_toks")))
        .select("doc_id", "lang", "n_toks", "w_e9")
        .orderBy(col("w_e9").desc, col("doc_id"))
        .limit(20)
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q537_mmr_rerank" -> {
      // unrolled greedy: pick_t / state_t CTE pairs, generated for
      // t = 2..K (pick 1 is pure relevance). EVERY step CTE is
      // MATERIALIZED: each references its predecessor twice, so the
      // un-materialized chain re-evaluates 2^K-fold (measured 94.8 s
      // -> 0.08 s) — the oracle-budget discipline of VERDICT r10 #2
      val steps = (2 to MmrK).map { t =>
        s"""p$t AS MATERIALIZED (SELECT c.i, 7 * c.rel6 - 3 * MAX(p.c6) AS sc
           |  FROM sl c JOIN pr p ON p.ia = c.i, s${t - 1} s
           |  WHERE list_contains(s.ids, p.ib)
           |    AND NOT list_contains(s.ids, c.i)
           |  GROUP BY c.i, c.rel6 ORDER BY sc DESC, c.i LIMIT 1),
           |s$t AS MATERIALIZED (SELECT list_append(s${t - 1}.ids, p$t.i)
           |  AS ids FROM s${t - 1}, p$t)""".stripMargin
      }.mkString(",\n")
      val picks = (1 to MmrK).map(t =>
        s"SELECT $t AS rank, i, sc FROM p$t").mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |    FROM embeddings),
         |q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
         |sl0 AS MATERIALIZED (SELECT vec_id, v,
         |    ${sqlCosineR6("v", "qe")} AS cos_r
         |  FROM e, q WHERE vec_id != 0
         |  ORDER BY cos_r DESC, vec_id LIMIT $ShortlistR),
         |sl AS MATERIALIZED (SELECT vec_id, v,
         |    CAST(round(cos_r * 1000000) AS BIGINT) AS rel6,
         |    CAST(ROW_NUMBER() OVER (ORDER BY cos_r DESC, vec_id) AS INT) AS i
         |  FROM sl0),
         |pr AS MATERIALIZED (SELECT a.i AS ia, b.i AS ib,
         |    CAST(round(${sqlCosineR6("a.v", "b.v")} * 1000000) AS BIGINT) AS c6
         |  FROM sl a, sl b),
         |p1 AS MATERIALIZED (SELECT i, 7 * rel6 AS sc FROM sl
         |  ORDER BY sc DESC, i LIMIT 1),
         |s1 AS MATERIALIZED (SELECT [p1.i] AS ids FROM p1),
         |$steps,
         |picks AS ($picks)
         |SELECT CAST(k.rank AS BIGINT) AS rank, sl.vec_id,
         |  sl.rel6 AS rel_c6, CAST(k.sc AS BIGINT) AS score_e7
         |FROM picks k JOIN sl ON k.i = sl.i ORDER BY rank""".stripMargin
    },

    "q538_err_cascade" -> {
      val p3 = Pow3.mkString("[", ",", "]")
      val p4 = Pow4.mkString("[", ",", "]")
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qs AS (SELECT vec_id AS qid, label AS qlabel, v AS qe FROM e
         |  WHERE vec_id < 8),
         |sc AS (SELECT qid, qlabel, vec_id, label,
         |    ${sqlCosineR6("v", "qe")} AS cos_r
         |  FROM e CROSS JOIN qs WHERE vec_id >= 8),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cos_r DESC, vec_id) AS rn FROM sc),
         |top AS (SELECT *, CASE WHEN label = qlabel THEN 2
         |    WHEN label // 2 = qlabel // 2 THEN 1 ELSE 0 END AS g
         |  FROM rk WHERE rn <= 20),
         |wc AS (SELECT *,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) OVER (PARTITION BY qid
         |      ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS c34,
         |    COUNT(CASE WHEN g = 2 THEN 1 END) OVER (PARTITION BY qid
         |      ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS c14
         |  FROM top),
         |t AS (SELECT qid, qlabel, g, rn,
         |    (CASE WHEN g = 2 THEN 3 WHEN g = 1 THEN 1 ELSE 0 END)
         |      * list_extract($p3, CAST(c34 AS INT) + 1) * 1000000000
         |      // (list_extract($p4, CAST(c34 + c14 AS INT) + 2) * rn)
         |      AS term_e9
         |  FROM wc)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(qlabel AS BIGINT) AS qlabel,
         |  CAST(SUM(term_e9) AS BIGINT) AS err_e9,
         |  CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel20,
         |  CAST(COALESCE(MIN(CASE WHEN g > 0 THEN rn END), -1) AS BIGINT)
         |    AS first_rel_rank
         |FROM t GROUP BY 1, 2 ORDER BY qid""".stripMargin
    },

    "q539_dsir_weights" ->
      s"""WITH toks AS (SELECT doc_id, lang,
         |    UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents),
         |tb AS MATERIALIZED (SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 4096 AS b
         |  FROM toks),
         |raw AS (SELECT b, COUNT(*) AS rc FROM tb GROUP BY b),
         |tgt AS (SELECT b, COUNT(*) AS tc FROM tb WHERE lang = 'en'
         |  GROUP BY b),
         |tots AS (SELECT (SELECT SUM(rc) FROM raw) AS rtot,
         |    (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS ttot),
         |sh AS (SELECT raw.b,
         |    GREATEST(1, (COALESCE(tc, 0) + 1) * 1000000 // (ttot + 4096))
         |      AS p,
         |    GREATEST(1, (rc + 1) * 1000000 // (rtot + 4096)) AS q
         |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tots),
         |sh2 AS (SELECT b, p, q, GREATEST(p, q) AS hi, LEAST(p, q) AS lo
         |  FROM sh),
         |${graft.ops.FixedLn.sqlLnE9Stages("sh2", "hi", "lo", "lnhl", "lx")},
         |lw AS (SELECT b, CASE WHEN p >= q THEN lnhl ELSE -lnhl END AS lr_e9
         |  FROM lx12),
         |d AS (SELECT t.doc_id, t.lang, COUNT(*) AS n_toks,
         |    SUM(l.lr_e9) AS ws
         |  FROM tb t JOIN lw l ON t.b = l.b GROUP BY 1, 2)
         |SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(${sdivSql("ws", "n_toks")} AS BIGINT) AS w_e9
         |FROM d ORDER BY w_e9 DESC, doc_id LIMIT 20""".stripMargin
  )
}
