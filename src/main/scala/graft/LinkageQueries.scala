package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linkage/allocation wave (round 10, sixty-sixth wave): Soundex
  * phonetic blocking built from scratch, Lincoln–Petersen/Chapman
  * capture–recapture, coarsened exact matching, and proportional seat
  * apportionment (Hamilton vs D'Hondt) with the Alabama-paradox probe.
  *
  * Reference intent: the reference joins entities by exact keys only
  * (store_id/product_id equality throughout
  * services/training-service/app/db_utils.py) — no fuzzy linkage, no
  * estimation of what the join MISSED, no causal adjustment, no quota
  * arithmetic. q437 implements American Soundex as a pure expression
  * chain (strip → keep-first → drop H/W → translate → collapse runs →
  * drop separators → pad) — the 1918 algorithm with its H/W
  * transparency and first-letter-collapse subtleties intact — and
  * blocks the corpus vocabulary with it. q438 runs the two-detector
  * capture–recapture design (Chapman 1951): split the corpus 50/50 by
  * doc hash, "capture" the trigram vocabulary twice, estimate the
  * total from (n1, n2, overlap) alone, then grade against the known
  * union — single-document trigrams can never be recaptured, so the
  * overlap deflates and the estimate runs high, a catchability
  * violation disclosed, not hidden. q439 is coarsened exact matching (Iacus,
  * King & Porro 2012): ATT of a market segment on spend over
  * region × balance-bin × order-count-bin strata, common support
  * enforced, off-support treated counted. q440 allocates a 100-unit
  * sampling quota across nations by largest remainder (Hamilton) and
  * highest averages (D'Hondt) — quotient ranking via exact
  * cross-multiplied pair counts on the nations×seats grain (never a
  * float division), and the Alabama paradox is PROBED by re-running
  * Hamilton at 101 seats and counting nations that lose a seat.
  */
object LinkageQueries {

  /** Soundex as one expression chain over column `c` (Spark SQL
    * dialect when duck=false, DuckDB when duck=true — identical
    * semantics; DuckDB's regexp_replace replaces only the FIRST match
    * unless given the 'g' flag, Spark's always replaces all).
    * Letter→code table: AEIOUYHW→0, BFPV→1, CGJKQSXZ→2, DT→3, L→4,
    * MN→5, R→6; H/W dropped after position 1 (adjacency-transparent),
    * runs collapsed BEFORE the first-letter code is dropped (so
    * Pfister → P236), separators (0) removed last. */
  private[graft] def soundexExpr(c: String, duck: Boolean): String = {
    def rr(e: String, pat: String, rep: String): String =
      if (duck) s"regexp_replace($e, '$pat', '$rep', 'g')"
      else s"regexp_replace($e, '$pat', '$rep')"
    val u = s"upper(${rr(c, "[^A-Za-z]", "")})"
    val s2 = s"concat(substr($u, 1, 1), ${rr(s"substr($u, 2)", "[HW]", "")})"
    val cd = s"translate($s2, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', " +
      "'01230120022455012623010202')"
    val cl = (1 to 6).foldLeft(cd)((acc, d) => rr(acc, s"$d{2,}", s"$d"))
    val dig = rr(s"substr($cl, 2)", "0", "")
    s"concat(substr($u, 1, 1), substr(concat($dig, '000'), 1, 3))"
  }

  /** Classic record-linkage surnames (lowercased): the fixed probe set
    * blocked alongside the corpus vocabulary in q437. */
  private[graft] val ProbeNames: Seq[String] = Seq(
    "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
    "honeyman", "jackson", "jaxon", "smith", "smythe", "lloyd")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G382: Soundex phonetic blocking of the corpus vocabulary ───────
    // One token scan → distinct vocabulary (vocabulary-scale from
    // there on, corpus-size-free) → Soundex per token → blocks with
    // ≥ 2 distinct tokens. The synthetic corpus's ~30-word vocabulary
    // happens to be collision-free, so a fixed PROBE list of classic
    // linkage surnames (design literals, mirrored in the oracle)
    // rides along — Robert/Rupert → R163, Ashcraft/Ashcroft → A261
    // via H-transparency, Smith/Smythe → S530, Jackson/Jaxon → J250 —
    // keeping the block table non-vacuous at every SF. The spec pins
    // the classic vectors (incl. Tymczak → T522 and Pfister → P236,
    // the first-letter-collapse case) AND equality with Spark's
    // built-in soundex() over the whole vocabulary.
    "q437_soundex_blocking" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val vocab = Tables.documents(s, dir)
        .select(explode(tokens(lower(col("text")))).as("tok"))
        .unionByName(s.createDataFrame(ProbeNames.map(Tuple1(_)))
          .toDF("tok"))
        .filter(col("tok").rlike("^[a-z]+$"))
        .distinct()
      vocab.withColumn("code", expr(soundexExpr("tok", duck = false)))
        .groupBy("code")
        .agg(count(lit(1)).as("n_toks"),
          sort_array(collect_list(col("tok"))).as("toks"))
        .filter(col("n_toks") >= 2)
        .withColumn("n_pairs", expr("n_toks * (n_toks - 1) div 2"))
        .select("code", "n_toks", "n_pairs", "toks")
        .orderBy("code")
    }),

    // ── G383: capture–recapture estimate of the trigram vocabulary ─────
    // Two "captures": the trigram sets of the doc-hash halves A and
    // B. Chapman's nearly-unbiased form N̂ = (n1+1)(n2+1)/(m+1) − 1;
    // Lincoln–Petersen n1·n2/m beside it. Because A ∪ B is the whole
    // corpus, the union IS the true count — certified — so the
    // estimator is priced in real error at e4. The design violates
    // equal catchability in BOTH directions: frequent trigrams land
    // in both halves (inflating m), while a trigram living in a
    // single document can never be recaptured at all (deflating m) —
    // on this corpus the second effect dominates and both estimators
    // run HIGH by ~50 %. The honest scoreboard discloses it; the
    // lesson is the closure/catchability assumptions, not the
    // arithmetic.
    "q438_capture_recapture" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val tri = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))"))
          .as("g"))
        .withColumn("ina", expr(
          "case when pmod(md5_60(cast(doc_id as string)), 2) = 0 " +
            "then 1L else 0L end"))
      val flags = tri.groupBy("g")
        .agg(max("ina").as("a"), max(expr("1L - ina")).as("b"))
      flags.agg(
          sum("a").as("n1"), sum("b").as("n2"),
          sum(expr("a * b")).as("m"), count(lit(1)).as("n_true"))
        .withColumn("lp_est", expr("n1 * n2 div m"))
        .withColumn("chapman_est", expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1"))
        .select(col("n1"), col("n2"), col("m"), col("n_true"),
          expr("case when n1 + n2 - m = n_true then 1L else 0L end")
            .as("union_is_truth"),
          col("lp_est"), col("chapman_est"),
          expr("(lp_est - n_true) * 10000 div n_true").as("lp_err_e4"),
          expr("(chapman_est - n_true) * 10000 div n_true").as("chapman_err_e4"))
    }),

    // ── G384: coarsened exact matching (CEM) ATT ───────────────────────
    // Treatment: the AUTOMOBILE market segment. Outcome: lifetime
    // spend in cents (0 for never-ordered customers — they stay in).
    // Coarsening is DESIGN-chosen, not data-chosen (the CEM rule):
    // region × fixed account-balance bins (<0, <3333, <6666, rest) ×
    // order-count bins (0, 1-5, 6-15, 16+). ATT averages per-stratum
    // treated-minus-control means weighted by treated counts over
    // strata with COMMON SUPPORT; off-support treated are counted,
    // not silently dropped. The generator assigns segments at random,
    // so ATT ≈ naive ≈ 0 — the null runs as data (q418's discipline).
    "q439_cem_att" -> ((s, dir) => {
      val cents = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("sp"),
          count(lit(1)).as("cnt"))
      val nr = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("cast(round(c_acctbal * 100) as bigint)").as("bal"),
          col("c_nationkey").as("n_nationkey"))
        .join(broadcast(nr), "n_nationkey")
        .join(cents.withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("n_regionkey").as("reg"),
          expr("case when c_mktsegment = 'AUTOMOBILE' then 1L else 0L end")
            .as("t"),
          coalesce(col("sp"), lit(0L)).as("y"),
          expr("""case when bal < 0 then 0L when bal < 333300 then 1L
                 |     when bal < 666600 then 2L else 3L end""".stripMargin)
            .as("bb"),
          expr("""case when coalesce(cnt, 0) = 0 then 0L
                 |     when coalesce(cnt, 0) <= 5 then 1L
                 |     when coalesce(cnt, 0) <= 15 then 2L else 3L end"""
            .stripMargin).as("cb"))
      val strata = base.groupBy("reg", "bb", "cb")
        .agg(sum("t").as("nt"), sum(expr("t * y")).as("st"),
          sum(expr("1L - t")).as("nc"), sum(expr("(1L - t) * y")).as("sc"))
      val m = strata.filter(col("nt") > 0 && col("nc") > 0)
        .agg(sum("nt").as("nt_m"), count(lit(1)).as("k_matched"),
          sum(expr("(st * nc - nt * sc) * 100 div nc")).as("att_num_e2"))
      val tot = strata.agg(sum("nt").as("nt_all"), sum("st").as("st_all"),
        sum("nc").as("nc_all"), sum("sc").as("sc_all"),
        count(lit(1)).as("k_strata"))
      tot.crossJoin(broadcast(m))
        .select(col("nt_all").as("n_treated"), col("nc_all").as("n_control"),
          col("k_strata").as("n_strata"), col("k_matched").as("n_strata_matched"),
          col("nt_m").as("n_treated_matched"),
          expr("nt_all - nt_m").as("n_treated_dropped"),
          expr("st_all * 100 div nt_all - sc_all * 100 div nc_all")
            .as("naive_diff_e2"),
          expr("att_num_e2 div nt_m").as("att_e2"))
    }),

    // ── G385: quota apportionment — Hamilton vs D'Hondt ────────────────
    // 100 sampling seats across nations, votes = order counts.
    // Hamilton: floor quotas + largest remainders (ties → votes desc,
    // nation asc). D'Hondt: the top-100 of the quotient table
    // {v_g/j : j ≤ 100}, ranked by EXACT cross-multiplication
    // (v2·j > v·j2) on the nations×100 grain — 2 500 rows regardless
    // of corpus size, so the all-pairs rank join is corpus-free.
    // Hamilton re-runs at 101 seats: a nation losing a seat when the
    // house GROWS is the Alabama paradox (the reason the US House
    // abandoned Hamilton in 1911) — probed and counted, zero is the
    // honest usual answer. Σseats certificates live in the spec.
    "q440_apportionment" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val v = Tables.orders(s, dir).select(col("o_custkey"))
        .join(c, "o_custkey").groupBy("g").agg(count(lit(1)).as("votes"))
      val tot = v.agg(sum("votes").as("vt"))
      def hamilton(house: Int): DataFrame = {
        val w = v.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"votes * $house div vt"))
          .withColumn("rem", expr(s"votes * $house - (votes * $house div vt) * vt"))
        val extra = w.agg((lit(house.toLong) - sum("base")).as("extra"))
        val r = w.select(col("g").as("g2"), col("rem").as("rem2"),
          col("votes").as("v2"))
        w.crossJoin(broadcast(r))
          .groupBy("g")
          .agg(max("votes").as("votes"), max("base").as("base"),
            sum(expr("""case when rem2 > rem or (rem2 = rem and
                       |  (v2 > votes or (v2 = votes and g2 < g)))
                       |then 1L else 0L end""".stripMargin)).as("rank0"))
          .crossJoin(broadcast(extra))
          .select(col("g"), col("votes"),
            expr("base + (case when rank0 < extra then 1L else 0L end)")
              .as(s"ham_$house"))
      }
      val quot = v.select(col("g"), col("votes"),
        explode(expr("sequence(1L, 100L)")).as("j"))
      val q2 = quot.select(col("g").as("g2"), col("votes").as("v2"),
        col("j").as("j2"))
      val dh = quot.join(broadcast(q2),
          expr("""v2 * j > votes * j2 or (v2 * j = votes * j2 and
                 |  (v2 > votes or (v2 = votes and g2 < g)))""".stripMargin),
          "left")
        .groupBy("g", "j")
        .agg(max("votes").as("votes"),
          sum(expr("case when g2 is null then 0L else 1L end")).as("rank0"))
        .groupBy("g")
        .agg(sum(expr("case when rank0 < 100 then 1L else 0L end")).as("dh_100"))
      hamilton(100).join(hamilton(101).select("g", "ham_101"), "g")
        .join(dh, "g")
        .crossJoin(broadcast(tot))
        .select(col("g"), col("votes"),
          expr("votes * 1000000 div vt").as("quota_e4"),
          col("ham_100"), col("ham_101"),
          expr("case when ham_101 < ham_100 then 1L else 0L end")
            .as("alabama_drop"),
          col("dh_100"),
          expr("dh_100 - ham_100").as("dh_minus_ham"))
        .orderBy("g")
    })
  )

  def oracleSql: Map[String, String] = {
    val sdx = soundexExpr("tok", duck = true)
    def hamCte(house: Int, tag: String): String =
      s"""w$tag AS (SELECT g, votes, votes * $house // vt AS base,
         |    votes * $house - (votes * $house // vt) * vt AS rem
         |  FROM v, tot),
         |ex$tag AS (SELECT $house - SUM(base) AS extra FROM w$tag),
         |h$tag AS (SELECT a.g, a.votes,
         |    a.base + (CASE WHEN SUM(CASE WHEN b.rem > a.rem OR (b.rem = a.rem
         |      AND (b.votes > a.votes OR (b.votes = a.votes AND b.g < a.g)))
         |      THEN 1 ELSE 0 END) < (SELECT extra FROM ex$tag)
         |      THEN 1 ELSE 0 END) AS ham_$house
         |  FROM w$tag a, w$tag b GROUP BY a.g, a.votes, a.base)"""
        .stripMargin
    Map(

    "q437_soundex_blocking" ->
      s"""WITH toks AS (SELECT DISTINCT tok FROM (
        |    SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+'))
        |      AS tok FROM documents
        |    UNION ALL
        |    SELECT UNNEST([${ProbeNames.map("'" + _ + "'").mkString(", ")}])) z),
        |vocab AS (SELECT tok FROM toks WHERE regexp_matches(tok, '^[a-z]+$$')),
        |coded AS (SELECT tok, $sdx AS code FROM vocab)
        |SELECT code, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |  CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_pairs,
        |  list_sort(list(tok)) AS toks
        |FROM coded GROUP BY code HAVING COUNT(*) >= 2
        |ORDER BY code""".stripMargin,

    "q438_capture_recapture" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |tri AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ts) - 1),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS ina
        |  FROM t WHERE len(ts) >= 3),
        |fl AS (SELECT g, MAX(ina) AS a, MAX(1 - ina) AS b FROM tri GROUP BY g),
        |agg AS (SELECT SUM(a) AS n1, SUM(b) AS n2, SUM(a * b) AS m,
        |    COUNT(*) AS n_true FROM fl)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(m AS BIGINT) AS m, CAST(n_true AS BIGINT) AS n_true,
        |  CAST(CASE WHEN n1 + n2 - m = n_true THEN 1 ELSE 0 END AS BIGINT)
        |    AS union_is_truth,
        |  CAST(n1 * n2 // m AS BIGINT) AS lp_est,
        |  CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_est,
        |  CAST((n1 * n2 // m - n_true) * 10000 // n_true AS BIGINT)
        |    AS lp_err_e4,
        |  CAST(((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 10000
        |    // n_true AS BIGINT) AS chapman_err_e4
        |FROM agg""".stripMargin,

    "q439_cem_att" ->
      """WITH sp AS (SELECT o_custkey,
        |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sp,
        |    COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        |base AS (SELECT c.c_custkey, n.n_regionkey AS reg,
        |    CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
        |    COALESCE(sp.sp, 0) AS y,
        |    CASE WHEN CAST(ROUND(c.c_acctbal * 100) AS BIGINT) < 0 THEN 0
        |         WHEN CAST(ROUND(c.c_acctbal * 100) AS BIGINT) < 333300 THEN 1
        |         WHEN CAST(ROUND(c.c_acctbal * 100) AS BIGINT) < 666600 THEN 2
        |         ELSE 3 END AS bb,
        |    CASE WHEN COALESCE(sp.cnt, 0) = 0 THEN 0
        |         WHEN COALESCE(sp.cnt, 0) <= 5 THEN 1
        |         WHEN COALESCE(sp.cnt, 0) <= 15 THEN 2 ELSE 3 END AS cb
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  LEFT JOIN sp ON sp.o_custkey = c.c_custkey),
        |strata AS (SELECT reg, bb, cb, SUM(t) AS nt, SUM(t * y) AS st,
        |    SUM(1 - t) AS nc, SUM((1 - t) * y) AS sc
        |  FROM base GROUP BY reg, bb, cb),
        |m AS (SELECT SUM(nt) AS nt_m, COUNT(*) AS k_matched,
        |    SUM((st * nc - nt * sc) * 100 // nc) AS att_num_e2
        |  FROM strata WHERE nt > 0 AND nc > 0),
        |tot AS (SELECT SUM(nt) AS nt_all, SUM(st) AS st_all,
        |    SUM(nc) AS nc_all, SUM(sc) AS sc_all, COUNT(*) AS k_strata
        |  FROM strata)
        |SELECT CAST(nt_all AS BIGINT) AS n_treated,
        |  CAST(nc_all AS BIGINT) AS n_control,
        |  CAST(k_strata AS BIGINT) AS n_strata,
        |  CAST(k_matched AS BIGINT) AS n_strata_matched,
        |  CAST(nt_m AS BIGINT) AS n_treated_matched,
        |  CAST(nt_all - nt_m AS BIGINT) AS n_treated_dropped,
        |  CAST(st_all * 100 // nt_all - sc_all * 100 // nc_all AS BIGINT)
        |    AS naive_diff_e2,
        |  CAST(att_num_e2 // nt_m AS BIGINT) AS att_e2
        |FROM tot, m""".stripMargin,

    "q440_apportionment" ->
      s"""WITH v AS (SELECT c.c_nationkey AS g, COUNT(*) AS votes
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey),
        |tot AS (SELECT SUM(votes) AS vt FROM v),
        |${hamCte(100, "a")},
        |${hamCte(101, "b")},
        |quot AS (SELECT g, votes, UNNEST(range(1, 101)) AS j FROM v),
        |dh AS (SELECT a.g,
        |    SUM(CASE WHEN (SELECT COUNT(*) FROM quot b
        |      WHERE b.votes * a.j > a.votes * b.j
        |        OR (b.votes * a.j = a.votes * b.j AND (b.votes > a.votes
        |          OR (b.votes = a.votes AND b.g < a.g)))) < 100
        |      THEN 1 ELSE 0 END) AS dh_100
        |  FROM quot a GROUP BY a.g)
        |SELECT ha.g, CAST(ha.votes AS BIGINT) AS votes,
        |  CAST(ha.votes * 1000000 // tot.vt AS BIGINT) AS quota_e4,
        |  CAST(ha.ham_100 AS BIGINT) AS ham_100,
        |  CAST(hb.ham_101 AS BIGINT) AS ham_101,
        |  CAST(CASE WHEN hb.ham_101 < ha.ham_100 THEN 1 ELSE 0 END AS BIGINT)
        |    AS alabama_drop,
        |  CAST(dh.dh_100 AS BIGINT) AS dh_100,
        |  CAST(dh.dh_100 - ha.ham_100 AS BIGINT) AS dh_minus_ham
        |FROM ha JOIN hb ON ha.g = hb.g JOIN dh ON ha.g = dh.g, tot
        |ORDER BY ha.g""".stripMargin
    )
  }
}
