package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus-operations wave (round 12, second wave): the information-
  * theoretic drift gates and published quality-rule census a training-
  * data pipeline runs per epoch over its document corpus.
  *
  * Reference intent — every query names its consumer:
  *  - q554: q89/q269 fix a target source MIXTURE for each training
  *    epoch; the epoch-over-epoch gate is KL(current ‖ reference) of
  *    the per-source token-mass shares with the per-source signed
  *    contributions (Kullback & Leibler 1951) — the number that says
  *    WHICH source drifted, not just that something did. Consumer: the
  *    q89 mixture builder's change-control check.
  *  - q555: q126 ranks drifted tokens by raw ratio (unbounded, top-k);
  *    its scalar gate is the Jensen–Shannon divergence (Lin 1991) of
  *    the two halves' token distributions — bounded by ln 2, symmetric,
  *    defined even for vocabulary mismatch. Consumer: the q126 drift
  *    dashboard's alert threshold, per language.
  *  - q556: Dunning's log-likelihood G² (Dunning 1993, "Accurate
  *    methods for the statistics of surprise and coincidence") — the
  *    significance-ranked keyness list that replaces q126's raw-ratio
  *    ranking when counts are small. Consumer: the corpus-diff report
  *    beside q126.
  *  - q557: the Gopher quality rules (Rae et al. 2021, "Scaling
  *    Language Models: ... Gopher", Table A1) as a per-rule violation
  *    census: word-count bounds, mean-word-length bounds, stopword
  *    presence, and top-bigram repetition mass. Consumer: q87's corpus
  *    pipeline front gate — the published-ruleset counterpart of q18's
  *    ad-hoc quality score (rule thresholds are the paper's).
  *
  * House rules: exact integer arithmetic (e4/e6/e9 ratios, BIGINT div,
  * FixedLn for every logarithm), totally ordered outputs, per-key
  * aggregates before any window.
  */
object CorpusOpsQueries {

  private def sdiv(num: String, den: String) =
    s"case when ($num) >= 0 then ($num) div ($den) else -((-($num)) div ($den)) end"
  private def sdivSql(num: String, den: String) =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END"

  /** q557: pinned Gopher-style stopword list (the corpus's closed
    * 31-word vocabulary contains 'the' and 'a'; the rule demands ≥ 2
    * DISTINCT list members per doc, so it genuinely fires). */
  private val StopList = Seq("the", "a", "of", "and", "to", "in")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G499: KL divergence of the source mixture ──────────────────────
    // Reference epoch = even doc_ids, current = odd. Shares are
    // token-mass per source at e6 (clipped ≥ 1 — q534's discipline);
    // per-source signed contribution p·ln(p/q) at e9. Σ ≥ 0 by Gibbs.
    "q554_kl_mixture" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select((col("doc_id") % 2 === 0).as("ref"), col("source"),
          size(tokens(col("text"))).cast("long").as("ntok"))
      val bySrc = tok.groupBy("source").agg(
        sum(when(col("ref"), col("ntok")).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("ref"), col("ntok")).otherwise(0L)).as("cnt_cur"))
      val tot = bySrc.agg(sum("cnt_ref").as("na"), sum("cnt_cur").as("nb"))
      val sh = bySrc.crossJoin(broadcast(tot))
        .withColumn("q_e6", expr("greatest(1L, cnt_ref * 1000000 div na)"))
        .withColumn("p_e6", expr("greatest(1L, cnt_cur * 1000000 div nb)"))
        .withColumn("hi", greatest(col("p_e6"), col("q_e6")))
        .withColumn("lo", least(col("p_e6"), col("q_e6")))
      graft.ops.FixedLn.lnE9(sh, "hi", "lo", "lnr")
        .withColumn("kl_term_e9", expr(sdiv(
          "case when p_e6 >= q_e6 then p_e6 * lnr else -(p_e6 * lnr) end",
          "1000000")))
        .select("source", "cnt_ref", "cnt_cur", "q_e6", "p_e6", "kl_term_e9")
        .orderBy("source")
    }),

    // ── G500: Jensen–Shannon divergence of token distributions ─────────
    // Per language: halves A (even doc_ids) / B (odd); m = (p+q)/2;
    // JSD = (KL(p‖m) + KL(q‖m))/2 at e9 — bounded by ln 2 = 0.6931…
    // Two FixedLn chains; the projection between them resets the staged
    // column namespace (both engines).
    "q555_js_divergence" -> ((s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("lang"), (col("doc_id") % 2 === 0).as("a"),
          explode(tokens(col("text"))).as("tok"))
      val c = t.groupBy("lang", "tok").agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      val tot = c.groupBy("lang").agg(sum("ca").as("na"), sum("cb").as("nb"))
      val sh = c.join(broadcast(tot), Seq("lang"))
        .withColumn("p", expr("greatest(1L, ca * 1000000 div na)"))
        .withColumn("q", expr("greatest(1L, cb * 1000000 div nb)"))
        .withColumn("m", expr("greatest(1L, (p + q) div 2)"))
      val ln1 = graft.ops.FixedLn.lnE9(
        sh.withColumn("hi", greatest(col("p"), col("m")))
          .withColumn("lo", least(col("p"), col("m"))), "hi", "lo", "lnpm")
        .drop("hi", "lo")
      val ln2c = graft.ops.FixedLn.lnE9(
        ln1.withColumn("hi", greatest(col("q"), col("m")))
          .withColumn("lo", least(col("q"), col("m"))), "hi", "lo", "lnqm")
      ln2c
        .withColumn("tp", expr(
          "case when p >= m then p * lnpm else -(p * lnpm) end"))
        .withColumn("tq", expr(
          "case when q >= m then q * lnqm else -(q * lnqm) end"))
        .groupBy("lang")
        .agg(max("na").as("n_tokens_a"), max("nb").as("n_tokens_b"),
          count(lit(1)).as("vocab"),
          expr(sdiv("sum(tp) + sum(tq)", "2000000")).as("jsd_e9"))
        .withColumn("within_ln2", expr(
          s"case when jsd_e9 <= ${graft.ops.FixedLn.Ln2E9}L then 1L else 0L end"))
        .orderBy("lang")
    }),

    // ── G501: Dunning G² keyness between corpus halves ─────────────────
    // Per token: observed a/b vs expected under pooled rates;
    // G² = 2·(a·ln(a/Ea) + b·ln(b/Eb)). The ratio a/Ea is formed as
    // a·(na+nb) / (na·(a+b)) — products rescaled to ~e6 before FixedLn
    // (q541's magnitude guard; the ratio moves < 1e-6 relative,
    // identically in both engines). Zero cells contribute 0 (the
    // x·ln x → 0 limit). Top-20 by G², direction = the overrepresented
    // half.
    "q556_dunning_g2" -> ((s, dir) => {
      val t = Tables.documents(s, dir)
        .select((col("doc_id") % 2 === 0).as("a"),
          explode(tokens(col("text"))).as("tok"))
      val c = t.groupBy("tok").agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      val m = c.agg(sum("ca").as("na"), sum("cb").as("nb"))
      def lnLeg(df: DataFrame, obs: String, tot: String, out: String,
                pre: String): DataFrame = {
        val staged = df
          .withColumn(s"${pre}_num", expr(s"greatest(1L, $obs * (na + nb))"))
          .withColumn(s"${pre}_den", expr(s"greatest(1L, $tot * (ca + cb))"))
          .withColumn("sc", expr(
            s"greatest(1L, greatest(${pre}_num, ${pre}_den) div 1000000)"))
          .withColumn("hi", expr(
            s"greatest(${pre}_num, ${pre}_den) div sc"))
          .withColumn("lo", expr(
            s"greatest(1L, least(${pre}_num, ${pre}_den) div sc)"))
        graft.ops.FixedLn.lnE9(staged, "hi", "lo", s"${pre}_ln")
          .withColumn(out, expr(
            s"case when $obs = 0 then 0L " +
              s"when ${pre}_num >= ${pre}_den then $obs * ${pre}_ln " +
              s"else -($obs * ${pre}_ln) end"))
          .drop("sc", "hi", "lo", s"${pre}_num", s"${pre}_den", s"${pre}_ln")
      }
      val withA = lnLeg(c.crossJoin(broadcast(m)), "ca", "na", "ta", "ga")
      val withB = lnLeg(withA, "cb", "nb", "tb", "gb")
      withB
        .withColumn("g2_e9", expr("2 * (ta + tb)"))
        .withColumn("direction", expr(
          "case when ca * nb >= cb * na then 'a' else 'b' end"))
        .filter(col("ca") + col("cb") >= 10)
        .orderBy(col("g2_e9").desc, col("tok"))
        .limit(20)
        .select("tok", "ca", "cb", "g2_e9", "direction")
    }),

    // ── G502: Gopher quality-rule census ───────────────────────────────
    // Per doc: R1 word count ∈ [50, 100000]; R2 mean word length ∈
    // [3, 10] (e2 ints); R3 ≥ 2 distinct pinned stopwords; R4 top
    // adjacent-bigram mass ≤ 20 % of tokens. All four are per-row HOF
    // projections (zero shuffle until the per-language census); the
    // bigram top count is O(|distinct pairs|·n) per doc — bounded by
    // the doc, never the corpus.
    "q557_gopher_rules" -> ((s, dir) => {
      val stop = StopList.map(w => s"'$w'").mkString("array(", ", ", ")")
      // spread: the per-doc repetition scan (O(pairs²) worst case)
      // otherwise runs inside the single-row-group scan's one task
      val d = graft.ops.Relational.spread(Tables.documents(s, dir))
        .select(col("lang"), tokens(col("text")).as("toks"))
        .withColumn("n", expr("cast(size(toks) as bigint)"))
        .withColumn("mwl_e2", expr(
          "aggregate(transform(toks, t -> cast(length(t) as bigint)), 0L, " +
            "(x, y) -> x + y) * 100 div n"))
        .withColumn("nstop", expr(s"size(array_intersect(toks, $stop))"))
        // n < 2 guard (ADVICE r12): sequence(1, n-1) with n = 1 yields the
        // DESCENDING array [1, 0] and element_at(toks, 0) throws — while
        // the oracle's range(1, len) is empty and null-coalesces through
        // f_rep. Emit the same empty-pairs shape the oracle sees.
        .withColumn("pairs", expr(
          "case when n >= 2 then transform(sequence(1, cast(n as int) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) " +
            "else array() end"))
        .withColumn("topp", expr(
          "cast(array_max(transform(array_distinct(pairs), " +
            "p -> size(filter(pairs, x -> x = p)))) as bigint)"))
        .withColumn("f_len", expr(
          "case when n < 50 or n > 100000 then 1L else 0L end"))
        .withColumn("f_mwl", expr(
          "case when mwl_e2 < 300 or mwl_e2 > 1000 then 1L else 0L end"))
        .withColumn("f_stop", expr("case when nstop < 2 then 1L else 0L end"))
        .withColumn("f_rep", expr(
          "case when topp * 2 * 10000 div n > 2000 then 1L else 0L end"))
        .withColumn("pass", expr(
          "case when f_len + f_mwl + f_stop + f_rep = 0 then 1L else 0L end"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("f_len").as("n_fail_len"), sum("f_mwl").as("n_fail_mwl"),
          sum("f_stop").as("n_fail_stop"), sum("f_rep").as("n_fail_rep"),
          sum("pass").as("n_pass"),
          expr("sum(case when pass = 1 then n else 0L end) * 10000 div sum(n)")
            .as("retained_e4"))
        .orderBy("lang")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q554_kl_mixture" ->
      s"""WITH tok AS (SELECT doc_id % 2 = 0 AS ref, source,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS ntok FROM documents),
        |bysrc AS (SELECT source,
        |    SUM(CASE WHEN ref THEN ntok ELSE 0 END) AS cnt_ref,
        |    SUM(CASE WHEN ref THEN 0 ELSE ntok END) AS cnt_cur
        |  FROM tok GROUP BY source),
        |tot AS (SELECT SUM(cnt_ref) AS na, SUM(cnt_cur) AS nb FROM bysrc),
        |sh AS (SELECT bysrc.*,
        |    GREATEST(1, cnt_ref * 1000000 // na) AS q_e6,
        |    GREATEST(1, cnt_cur * 1000000 // nb) AS p_e6
        |  FROM bysrc, tot),
        |shc AS (SELECT *, GREATEST(p_e6, q_e6) AS hi, LEAST(p_e6, q_e6) AS lo
        |  FROM sh),
        |${graft.ops.FixedLn.sqlLnE9Stages("shc", "hi", "lo", "lnr", "lx")}
        |SELECT source, CAST(cnt_ref AS BIGINT) AS cnt_ref,
        |  CAST(cnt_cur AS BIGINT) AS cnt_cur,
        |  CAST(q_e6 AS BIGINT) AS q_e6, CAST(p_e6 AS BIGINT) AS p_e6,
        |  CAST(${sdivSql(
             "CASE WHEN p_e6 >= q_e6 THEN p_e6 * lnr ELSE -(p_e6 * lnr) END",
             "1000000")} AS BIGINT) AS kl_term_e9
        |FROM lx12 ORDER BY source""".stripMargin,

    "q555_js_divergence" ->
      s"""WITH t AS (SELECT lang, doc_id % 2 = 0 AS a,
        |    UNNEST(${sqlTokens("text")}) AS tok FROM documents),
        |c AS (SELECT lang, tok,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb
        |  FROM t GROUP BY lang, tok),
        |tot AS (SELECT lang, SUM(ca) AS na, SUM(cb) AS nb FROM c
        |  GROUP BY lang),
        |sh AS (SELECT c.lang, c.tok, tot.na, tot.nb,
        |    GREATEST(1, ca * 1000000 // na) AS p,
        |    GREATEST(1, cb * 1000000 // nb) AS q
        |  FROM c JOIN tot ON c.lang = tot.lang),
        |shm AS (SELECT *, GREATEST(1, (p + q) // 2) AS m FROM sh),
        |c1 AS (SELECT *, GREATEST(p, m) AS hi, LEAST(p, m) AS lo FROM shm),
        |${graft.ops.FixedLn.sqlLnE9Stages("c1", "hi", "lo", "lnpm", "la")},
        |mid AS (SELECT lang, tok, na, nb, p, q, m, lnpm FROM la12),
        |c2 AS (SELECT *, GREATEST(q, m) AS hi, LEAST(q, m) AS lo FROM mid),
        |${graft.ops.FixedLn.sqlLnE9Stages("c2", "hi", "lo", "lnqm", "lb")},
        |terms AS (SELECT lang, na, nb,
        |    CASE WHEN p >= m THEN p * lnpm ELSE -(p * lnpm) END AS tp,
        |    CASE WHEN q >= m THEN q * lnqm ELSE -(q * lnqm) END AS tq
        |  FROM lb12),
        |agg AS (SELECT lang, MAX(na) AS n_tokens_a, MAX(nb) AS n_tokens_b,
        |    COUNT(*) AS vocab,
        |    ${sdivSql("SUM(tp) + SUM(tq)", "2000000")} AS jsd_e9
        |  FROM terms GROUP BY lang)
        |SELECT lang, CAST(n_tokens_a AS BIGINT) AS n_tokens_a,
        |  CAST(n_tokens_b AS BIGINT) AS n_tokens_b,
        |  CAST(vocab AS BIGINT) AS vocab, CAST(jsd_e9 AS BIGINT) AS jsd_e9,
        |  CAST(CASE WHEN jsd_e9 <= ${graft.ops.FixedLn.Ln2E9}
        |    THEN 1 ELSE 0 END AS BIGINT) AS within_ln2
        |FROM agg ORDER BY lang""".stripMargin,

    "q556_dunning_g2" ->
      s"""WITH t AS (SELECT doc_id % 2 = 0 AS a,
        |    UNNEST(${sqlTokens("text")}) AS tok FROM documents),
        |c AS (SELECT tok,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb
        |  FROM t GROUP BY tok),
        |m AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c),
        |ga0 AS (SELECT c.*, m.na, m.nb,
        |    GREATEST(1, ca * (na + nb)) AS ga_num,
        |    GREATEST(1, na * (ca + cb)) AS ga_den
        |  FROM c, m),
        |ga1 AS (SELECT *,
        |    GREATEST(1, GREATEST(ga_num, ga_den) // 1000000) AS sc FROM ga0),
        |ga2 AS (SELECT *, GREATEST(ga_num, ga_den) // sc AS hi,
        |    GREATEST(1, LEAST(ga_num, ga_den) // sc) AS lo FROM ga1),
        |${graft.ops.FixedLn.sqlLnE9Stages("ga2", "hi", "lo", "ga_ln", "pa")},
        |gat AS (SELECT tok, ca, cb, na, nb,
        |    CASE WHEN ca = 0 THEN 0
        |      WHEN ga_num >= ga_den THEN ca * ga_ln
        |      ELSE -(ca * ga_ln) END AS ta
        |  FROM pa12),
        |gb0 AS (SELECT *, GREATEST(1, cb * (na + nb)) AS gb_num,
        |    GREATEST(1, nb * (ca + cb)) AS gb_den FROM gat),
        |gb1 AS (SELECT *,
        |    GREATEST(1, GREATEST(gb_num, gb_den) // 1000000) AS sc FROM gb0),
        |gb2 AS (SELECT *, GREATEST(gb_num, gb_den) // sc AS hi,
        |    GREATEST(1, LEAST(gb_num, gb_den) // sc) AS lo FROM gb1),
        |${graft.ops.FixedLn.sqlLnE9Stages("gb2", "hi", "lo", "gb_ln", "pb")},
        |gbt AS (SELECT tok, ca, cb, na, nb, ta,
        |    CASE WHEN cb = 0 THEN 0
        |      WHEN gb_num >= gb_den THEN cb * gb_ln
        |      ELSE -(cb * gb_ln) END AS tb
        |  FROM pb12)
        |SELECT tok, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
        |  CAST(2 * (ta + tb) AS BIGINT) AS g2_e9,
        |  CASE WHEN ca * nb >= cb * na THEN 'a' ELSE 'b' END AS direction
        |FROM gbt WHERE ca + cb >= 10
        |ORDER BY g2_e9 DESC, tok LIMIT 20""".stripMargin,

    "q557_gopher_rules" -> {
      val stop = StopList.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH d0 AS (SELECT lang, ${sqlTokens("text")} AS toks
        |  FROM documents),
        |d1 AS (SELECT lang, toks, CAST(len(toks) AS BIGINT) AS n,
        |    list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT)))
        |      * 100 // len(toks) AS mwl_e2,
        |    len(list_intersect(list_distinct(toks), $stop)) AS nstop,
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]) AS pairs
        |  FROM d0),
        |d2 AS (SELECT lang, n, mwl_e2, nstop,
        |    CAST(list_max(list_transform(list_distinct(pairs),
        |      p -> len(list_filter(pairs, x -> x = p)))) AS BIGINT) AS topp
        |  FROM d1),
        |f AS (SELECT lang, n,
        |    CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS f_len,
        |    CASE WHEN mwl_e2 < 300 OR mwl_e2 > 1000 THEN 1 ELSE 0 END AS f_mwl,
        |    CASE WHEN nstop < 2 THEN 1 ELSE 0 END AS f_stop,
        |    CASE WHEN topp * 2 * 10000 // n > 2000 THEN 1 ELSE 0 END AS f_rep
        |  FROM d2),
        |p AS (SELECT *, CASE WHEN f_len + f_mwl + f_stop + f_rep = 0
        |    THEN 1 ELSE 0 END AS pass FROM f)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(f_len) AS BIGINT) AS n_fail_len,
        |  CAST(SUM(f_mwl) AS BIGINT) AS n_fail_mwl,
        |  CAST(SUM(f_stop) AS BIGINT) AS n_fail_stop,
        |  CAST(SUM(f_rep) AS BIGINT) AS n_fail_rep,
        |  CAST(SUM(pass) AS BIGINT) AS n_pass,
        |  CAST(SUM(CASE WHEN pass = 1 THEN n ELSE 0 END) * 10000
        |    // SUM(n) AS BIGINT) AS retained_e4
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}
