package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-and-estimation subsystem (round 10, fifty-seventh wave):
  * an EWMA control chart with trained limits, coordinated sampling
  * across snapshots, a held-out Good-Turing audit, and the WAND
  * max-score pruning certificate.
  *
  * Reference intent: the reference alerts on raw Prometheus gauges
  * (services/grafana dashboards) with no smoothing and no trained
  * limits, samples nothing, and retrieves nothing. q401 is the SPC
  * loop done as data: an exact-integer EWMA (λ=1/8 as a truncating
  * shift-divide — Spark `div` and DuckDB `//` both truncate toward
  * zero, verified) folded per event type over a dense daily spine,
  * flagged against μ±3σ limits trained on the first 60 % of days and
  * frozen. q402 certifies the property coordinated (bottom-hash)
  * sampling exists for: sample(A∩B) = sample(A)∩sample(B) EXACTLY, so
  * overlap statistics come from sample intersections alone. q403 is
  * Good-Turing with the only honest scoreboard — estimate unseen mass
  * and r* on TRAIN, measure them on HELDOUT. q404 certifies max-score
  * pruning (the WAND family): every doc whose upper bound is below
  * the 10th-best score is provably skippable, and the survivor top-10
  * equals the exact top-10 bit-for-bit.
  */
object ControlQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G346: EWMA control chart (trained limits, integer fold) ────────
    // Per event type, daily counts on a dense zero-filled spine (a
    // no-event day IS a zero observation — q357's finding). EWMA with
    // λ=1/8: e' = e + (x−e) div 8, exact under truncation; limits
    // μ ± 3σ from the first 60 % of days (σ = one-op floor-sqrt of the
    // integer variance), FROZEN, then scored on the rest. The fold
    // carries (e, n_flagged, xor) with e' inlined at every use — SQL
    // lambdas bind no locals (q361's discipline). Type-grain arrays
    // are calendar-bounded; the DuckDB oracle replays the identical
    // recurrence as a RECURSIVE CTE (its list_reduce is unsafe,
    // q389's finding).
    "q401_ewma_control" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("event_type").as("t"))
      val span = ev.agg(min("d").as("d0"), max("d").as("d1"))
      val spine = ev.select("t").distinct().crossJoin(broadcast(span))
        .select(col("t"), explode(expr("sequence(d0, d1)")).as("d"), col("d0"))
      val counts = ev.groupBy("t", "d").agg(count(lit(1)).as("x0"))
      val daily = spine.join(counts, Seq("t", "d"), "left")
        .select(col("t"), datediff(col("d"), col("d0")).cast("long").as("i"),
          coalesce(col("x0"), lit(0L)).as("x"))
        .localCheckpoint(true)
      val nd = daily.groupBy("t").agg(count(lit(1)).as("n_days"))
      val stats = daily.join(nd, "t")
        .filter(col("i") < expr("n_days * 6 div 10"))
        .groupBy("t").agg(count(lit(1)).as("ntr"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("mu", expr("sx div ntr"))
        .withColumn("sigma", expr(
          "cast(floor(sqrt(cast((ntr * sxx - sx * sx) div (ntr * ntr) as double))) as bigint)"))
        .withColumn("lo", expr("mu - 3 * sigma"))
        .withColumn("hi", expr("mu + 3 * sigma"))
        .select("t", "ntr", "mu", "sigma", "lo", "hi")
      val eNew = "(case when acc.e = -1L then z.x" +
        " else acc.e + (z.x - acc.e) div 8 end)"
      val flag = s"(z.i >= icut and ($eNew > hi or $eNew < lo))"
      daily.groupBy("t")
        .agg(expr("array_sort(collect_list(struct(i, x)))").as("xs"))
        .join(nd, "t").join(broadcast(stats), "t")
        .withColumn("icut", expr("n_days * 6 div 10"))
        .withColumn("st", expr(
          s"""aggregate(xs, named_struct('e', -1L, 'nf', 0L, 'xr', 0L),
             |  (acc, z) -> named_struct(
             |    'e', $eNew,
             |    'nf', acc.nf + (case when $flag then 1L else 0L end),
             |    'xr', case when $flag
             |          then acc.xr ^ md5_60(concat(t, ':', cast(z.i as string)))
             |          else acc.xr end))""".stripMargin))
        .select(col("t"), col("n_days"), col("mu"), col("sigma"),
          col("lo"), col("hi"),
          expr("st.nf").as("n_flagged"), expr("st.e").as("ewma_final"),
          expr("st.xr").as("xor60_flagged"))
        .orderBy("t")
    }),

    // ── G347: coordinated sampling across snapshots ────────────────────
    // Snapshots: users active in the first vs second half of the time
    // span (data-anchored midpoint). Coordinated 10 % sample: keep u
    // iff md5_60(u) < 2⁶⁰/10 — the SAME hash both sides, so
    // sample(A∩B) ≡ sample(A)∩sample(B) (certified zero mismatch; the
    // property that lets overlap be estimated from stored samples
    // without re-touching the snapshots). Jaccard estimated from the
    // samples vs exact, both e4, error disclosed.
    "q402_coordinated_sample" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg(expr("min(us) + (max(us) - min(us)) div 2").as("m"))
      val tagged = ev.crossJoin(broadcast(mid))
        .select(col("u"), when(col("us") <= col("m"), 1L).otherwise(0L).as("inA"),
          when(col("us") > col("m"), 1L).otherwise(0L).as("inB"))
        .groupBy("u").agg(max("inA").as("a"), max("inB").as("b"))
        .withColumn("samp",
          when(expr("md5_60(cast(u as string)) < 115292150460684697L"), 1L)
            .otherwise(0L))
      tagged.agg(
          sum("a").as("n_a"), sum("b").as("n_b"),
          sum(expr("a * b")).as("n_both"),
          sum(expr("samp * a")).as("s_a"), sum(expr("samp * b")).as("s_b"),
          sum(expr("samp * a * b")).as("s_both"))
        .withColumn("jac_exact_e4", expr(
          "n_both * 10000 div (n_a + n_b - n_both)"))
        .withColumn("jac_est_e4", expr(
          "s_both * 10000 div greatest(s_a + s_b - s_both, 1)"))
        .withColumn("err_e4", expr("abs(jac_est_e4 - jac_exact_e4)"))
    }),

    // ── G348: Good-Turing held-out audit ───────────────────────────────
    // Docs split 80/20 by md5(doc_id). TRAIN gives the
    // frequency-of-frequencies ladder N_r; Good-Turing predicts unseen
    // mass N₁/N and adjusted counts r* = (r+1)·N_{r+1}/N_r. HELDOUT
    // measures them: the actual unseen-event share, and per r the
    // train-size-normalized mean heldout occurrence of train-count-r
    // types (held_occ·N·10⁴ div (N_r·H) — the same-corpus-size
    // normalization GT's r* speaks in). Output: one row per r ∈ 0..3,
    // r=0 carrying the unseen-mass pair. The event grain is word
    // TRIGRAMS, not unigrams: the synthetic corpus draws from a CLOSED
    // 31-token vocabulary (min train count 23 at sf0.001 — no N₁..N₃
    // at any SF), while the trigram space (31³) has the Zipf tail GT
    // needs (N₁ = 8 975 at sf0.001, measured). Type grain, one corpus
    // shuffle per side.
    "q403_good_turing" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))")).as("tok"))
        .withColumn("held", expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) % 10 >= 8"))
      val train = toks.filter(!col("held")).groupBy("tok").agg(count(lit(1)).as("r"))
        .localCheckpoint(true)
      val nr = train.groupBy("r").agg(count(lit(1)).as("n_r"))
      val totals = train.agg(sum("r").as("n_train")).localCheckpoint(true)
      val heldJoined = toks.filter(col("held"))
        .join(train.withColumnRenamed("r", "train_r"), Seq("tok"), "left")
        .localCheckpoint(true)
      val hTot = heldJoined.agg(count(lit(1)).as("n_held"))
      // r = 0 row: GT unseen mass vs actual heldout unseen share (both e4)
      val unseen = heldJoined.filter(col("train_r").isNull)
        .agg(count(lit(1)).as("h_unseen"))
        .crossJoin(broadcast(hTot)).crossJoin(broadcast(totals))
        .crossJoin(broadcast(nr.filter(col("r") === 1)
          .select(col("n_r").as("n1"))))
        .select(lit(0L).as("r"), col("n1").as("n_types_r"),
          expr("n1 * 10000 div n_train").as("gt_e4"),
          expr("h_unseen * 10000 div n_held").as("actual_e4"))
      // r = 1..3 rows: r* vs normalized heldout mean occurrence
      val heldByR = heldJoined.filter(col("train_r").isNotNull)
        .groupBy(col("train_r").as("r")).agg(count(lit(1)).as("h_occ"))
      val rstar = nr.filter(col("r").between(1, 3))
        .join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r_next")), Seq("r"), "left")
        .join(heldByR, Seq("r"), "left")
        .crossJoin(broadcast(totals)).crossJoin(broadcast(hTot))
        .select(col("r"), col("n_r").as("n_types_r"),
          expr("(r + 1) * coalesce(n_r_next, 0L) * 10000 div n_r").as("gt_e4"),
          expr("coalesce(h_occ, 0L) * n_train * 10000 div (n_r * n_held)")
            .as("actual_e4"))
      unseen.unionByName(rstar).orderBy("r")
    }),

    // ── G349: WAND max-score pruning certificate ───────────────────────
    // Query: the 3 highest-df tokens of length ≥ 4 (deterministic,
    // tie → token asc). Scores: Σ tf·w with w = 10⁶ div df. Per-term
    // max contribution M_t is broadcast; each candidate doc's upper
    // bound Σ_{t∈doc} M_t ≥ its true score BY CONSTRUCTION, so docs
    // with UB < θ (θ = 10th-best exact score, TakeOrdered — at 10⁹
    // docs θ comes from a seed sample and tightens monotonically;
    // documented) are provably skippable. Certified: zero pruned docs
    // score ≥ θ, and the survivor top-10 xor equals the exact top-10
    // xor. Candidate work is bounded by the 3 posting lists.
    "q404_wand_pruning" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val tf = Tables.documents(s, dir)
        .select(col("doc_id").as("doc"), explode(tokens(lower(col("text")))).as("tok"))
        .groupBy("doc", "tok").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val q3 = df.filter(length(col("tok")) >= 4)
        .orderBy(col("df").desc, col("tok").asc).limit(3)
        .withColumn("w", expr("1000000 div df"))
      val post = tf.join(broadcast(q3), "tok")
        .withColumn("contrib", expr("tf * w"))
      val maxc = post.groupBy("tok").agg(max("contrib").as("m"))
      val perDoc = post.join(broadcast(maxc), "tok")
        .groupBy("doc").agg(sum("contrib").as("score"), sum("m").as("ub"))
        .localCheckpoint(true)
      val top10 = perDoc.orderBy(col("score").desc, col("doc").asc).limit(10)
      val theta = top10.agg(min("score").as("theta"))
      val audited = perDoc.crossJoin(broadcast(theta))
      val survivors = audited.filter(col("ub") >= col("theta"))
      val sTop10 = survivors.orderBy(col("score").desc, col("doc").asc).limit(10)
      val xorOf = (d: DataFrame) => d.agg(expr(
        "bit_xor(md5_60(concat(cast(doc as string), ':', cast(score as string))))")
        .as("x"))
      audited.agg(count(lit(1)).as("n_candidates"),
          sum(when(col("ub") < col("theta"), 1L).otherwise(0L)).as("n_pruned"),
          sum(when(col("ub") < col("theta") && col("score") >= col("theta"), 1L)
            .otherwise(0L)).as("n_violations"),
          max("theta").as("theta"))
        .withColumn("pruned_share_e4", expr("n_pruned * 10000 div n_candidates"))
        .crossJoin(broadcast(xorOf(top10).withColumnRenamed("x", "xor60_exact_top10")))
        .crossJoin(broadcast(xorOf(sTop10).withColumnRenamed("x", "xor60_pruned_top10")))
        .withColumn("top10_match", expr(
          "case when xor60_exact_top10 = xor60_pruned_top10 then 1L else 0L end"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q401_ewma_control" ->
      """WITH RECURSIVE ev AS (SELECT CAST(ts AS DATE) AS d, event_type AS t
        |                      FROM events),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ev),
        |spine AS (SELECT t, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS i
        |          FROM (SELECT DISTINCT t FROM ev) ty, span),
        |cnt AS (SELECT t, date_diff('day', d0, d) AS i, COUNT(*) AS x
        |        FROM ev, span GROUP BY t, date_diff('day', d0, d)),
        |daily AS (SELECT s.t, s.i, COALESCE(c.x, 0) AS x
        |          FROM spine s LEFT JOIN cnt c ON s.t = c.t AND s.i = c.i),
        |nd AS (SELECT t, COUNT(*) AS n_days FROM daily GROUP BY t),
        |st AS (SELECT d.t, COUNT(*) AS ntr, SUM(x) AS sx, SUM(x * x) AS sxx
        |       FROM daily d JOIN nd ON d.t = nd.t
        |       WHERE d.i < nd.n_days * 6 // 10 GROUP BY d.t),
        |lim AS (SELECT t, sx // ntr AS mu,
        |          CAST(FLOOR(SQRT(CAST((ntr * sxx - sx * sx) // (ntr * ntr)
        |            AS DOUBLE))) AS BIGINT) AS sigma
        |        FROM st),
        |lim2 AS (SELECT t, mu, sigma, mu - 3 * sigma AS lo, mu + 3 * sigma AS hi
        |         FROM lim),
        |ew AS (SELECT t, i, x AS e FROM daily WHERE i = 0
        |       UNION ALL
        |       SELECT d.t, d.i, ew.e + (d.x - ew.e) // 8
        |       FROM ew JOIN daily d ON d.t = ew.t AND d.i = ew.i + 1),
        |fl AS (SELECT ew.t, ew.i, ew.e
        |       FROM ew JOIN nd ON ew.t = nd.t JOIN lim2 l ON ew.t = l.t
        |       WHERE ew.i >= nd.n_days * 6 // 10 AND (ew.e > l.hi OR ew.e < l.lo)),
        |fin AS (SELECT ew.t, ew.e FROM ew JOIN nd ON ew.t = nd.t
        |        WHERE ew.i = nd.n_days - 1)
        |SELECT l.t, CAST(nd.n_days AS BIGINT) AS n_days,
        |       CAST(l.mu AS BIGINT) AS mu, CAST(l.sigma AS BIGINT) AS sigma,
        |       CAST(l.lo AS BIGINT) AS lo, CAST(l.hi AS BIGINT) AS hi,
        |       CAST(COALESCE((SELECT COUNT(*) FROM fl WHERE fl.t = l.t), 0)
        |         AS BIGINT) AS n_flagged,
        |       CAST(fin.e AS BIGINT) AS ewma_final,
        |       COALESCE((SELECT bit_xor(CAST('0x' || substr(md5(fl.t || ':' ||
        |           CAST(fl.i AS VARCHAR)), 1, 15) AS BIGINT))
        |         FROM fl WHERE fl.t = l.t), 0) AS xor60_flagged
        |FROM lim2 l JOIN nd ON l.t = nd.t JOIN fin ON l.t = fin.t
        |ORDER BY l.t""".stripMargin,

    "q402_coordinated_sample" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events),
        |mid AS (SELECT MIN(us) + (MAX(us) - MIN(us)) // 2 AS m FROM ev),
        |tagged AS (SELECT u,
        |    MAX(CASE WHEN us <= m THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN us > m THEN 1 ELSE 0 END) AS b,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15) AS BIGINT)
        |         < 115292150460684697 THEN 1 ELSE 0 END AS samp
        |  FROM ev, mid GROUP BY u),
        |agg AS (SELECT SUM(a) AS n_a, SUM(b) AS n_b, SUM(a * b) AS n_both,
        |          SUM(samp * a) AS s_a, SUM(samp * b) AS s_b,
        |          SUM(samp * a * b) AS s_both
        |        FROM tagged)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST(n_both AS BIGINT) AS n_both,
        |       CAST(s_a AS BIGINT) AS s_a, CAST(s_b AS BIGINT) AS s_b,
        |       CAST(s_both AS BIGINT) AS s_both,
        |       CAST(n_both * 10000 // (n_a + n_b - n_both) AS BIGINT) AS jac_exact_e4,
        |       CAST(s_both * 10000 // GREATEST(s_a + s_b - s_both, 1) AS BIGINT)
        |         AS jac_est_e4,
        |       CAST(ABS(s_both * 10000 // GREATEST(s_a + s_b - s_both, 1)
        |         - n_both * 10000 // (n_a + n_b - n_both)) AS BIGINT) AS err_e4
        |FROM agg""".stripMargin,

    "q403_good_turing" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ts) - 1),
        |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS tok,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |      % 10 >= 8 AS held
        |  FROM t WHERE len(ts) >= 3),
        |train AS (SELECT tok, COUNT(*) AS r FROM toks WHERE NOT held GROUP BY tok),
        |nr AS (SELECT r, COUNT(*) AS n_r FROM train GROUP BY r),
        |tot AS (SELECT SUM(r) AS n_train FROM train),
        |hj AS (SELECT t.tok, tr.r AS train_r FROM toks t
        |       LEFT JOIN train tr ON t.tok = tr.tok WHERE t.held),
        |ht AS (SELECT COUNT(*) AS n_held FROM hj),
        |r0 AS (SELECT CAST(0 AS BIGINT) AS r,
        |         CAST(n1.n_r AS BIGINT) AS n_types_r,
        |         CAST(n1.n_r * 10000 // tot.n_train AS BIGINT) AS gt_e4,
        |         CAST((SELECT COUNT(*) FROM hj WHERE train_r IS NULL) * 10000
        |           // ht.n_held AS BIGINT) AS actual_e4
        |       FROM (SELECT n_r FROM nr WHERE r = 1) n1, tot, ht),
        |hbr AS (SELECT train_r AS r, COUNT(*) AS h_occ FROM hj
        |        WHERE train_r IS NOT NULL GROUP BY train_r),
        |rs AS (SELECT nr.r, CAST(nr.n_r AS BIGINT) AS n_types_r,
        |         CAST((nr.r + 1) * COALESCE(nx.n_r, 0) * 10000 // nr.n_r
        |           AS BIGINT) AS gt_e4,
        |         CAST(COALESCE(hbr.h_occ, 0) * tot.n_train * 10000
        |           // (nr.n_r * ht.n_held) AS BIGINT) AS actual_e4
        |       FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1
        |         LEFT JOIN hbr ON hbr.r = nr.r, tot, ht
        |       WHERE nr.r BETWEEN 1 AND 3)
        |SELECT * FROM r0 UNION ALL SELECT CAST(r AS BIGINT), n_types_r, gt_e4,
        |  actual_e4 FROM rs ORDER BY r""".stripMargin,

    "q404_wand_pruning" ->
      """WITH tf AS (SELECT doc_id AS doc, tok, COUNT(*) AS tf FROM
        |    (SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\s+'))
        |       AS tok FROM documents) z
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |q3 AS (SELECT tok, df, 1000000 // df AS w FROM df
        |       WHERE length(tok) >= 4 ORDER BY df DESC, tok LIMIT 3),
        |post AS (SELECT tf.doc, tf.tok, tf.tf * q3.w AS contrib
        |         FROM tf JOIN q3 ON tf.tok = q3.tok),
        |mx AS (SELECT tok, MAX(contrib) AS m FROM post GROUP BY tok),
        |pd AS (SELECT doc, SUM(contrib) AS score, SUM(m) AS ub
        |       FROM post JOIN mx ON post.tok = mx.tok GROUP BY doc),
        |t10 AS (SELECT doc, score FROM pd ORDER BY score DESC, doc LIMIT 10),
        |th AS (SELECT MIN(score) AS theta FROM t10),
        |sv AS (SELECT doc, score FROM pd, th WHERE ub >= theta),
        |st10 AS (SELECT doc, score FROM sv ORDER BY score DESC, doc LIMIT 10),
        |xe AS (SELECT bit_xor(CAST('0x' || substr(md5(CAST(doc AS VARCHAR) || ':' ||
        |         CAST(score AS VARCHAR)), 1, 15) AS BIGINT)) AS x FROM t10),
        |xs AS (SELECT bit_xor(CAST('0x' || substr(md5(CAST(doc AS VARCHAR) || ':' ||
        |         CAST(score AS VARCHAR)), 1, 15) AS BIGINT)) AS x FROM st10),
        |agg AS (SELECT COUNT(*) AS n_candidates,
        |          SUM(CASE WHEN ub < theta THEN 1 ELSE 0 END) AS n_pruned,
        |          SUM(CASE WHEN ub < theta AND score >= theta THEN 1 ELSE 0 END)
        |            AS n_violations,
        |          MAX(theta) AS theta
        |        FROM pd, th)
        |SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
        |       CAST(n_pruned AS BIGINT) AS n_pruned,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(theta AS BIGINT) AS theta,
        |       CAST(n_pruned * 10000 // n_candidates AS BIGINT) AS pruned_share_e4,
        |       xe.x AS xor60_exact_top10, xs.x AS xor60_pruned_top10,
        |       CAST(CASE WHEN xe.x = xs.x THEN 1 ELSE 0 END AS BIGINT) AS top10_match
        |FROM agg, xe, xs""".stripMargin
  )
}
