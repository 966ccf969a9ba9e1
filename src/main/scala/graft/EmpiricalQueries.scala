package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical-validation wave (round 10, seventy-ninth wave): the LSH
  * S-curve measured against theory, a randomization test, and
  * Needleman–Wunsch pattern alignment.
  *
  * q471 closes the loop q262 opened: the banded-MinHash collision
  * curve P = 1 − (1 − J^r)^b is the DESIGN argument for (r=4, b=2) —
  * here it is MEASURED. The pair universe is a hash sample (the low-J
  * mass) UNION the known q23 dup pairs (the high-J tail random
  * sampling can't reach). The dup pairs were SELECTED by band
  * collision of the production family (salts ''/'1:'), so measuring
  * their collisions with that family would be pure selection bias
  * (P(collide | selected-by-collision) = 1); instead every pair's
  * collision is measured under a FRESH, independently-salted family
  * ('sc0:'/'sc1:') built only over the universe docs — pair selection
  * and measurement are independent, so every bucket's rate is an
  * unbiased estimate of the true S-curve. Exact 5-shingle Jaccard
  * buckets the pairs (ventiles), and the exact-integer theoretical
  * curve (stepwise e6 powers, truncation mirrored) sits beside the
  * measured rate per bucket. The sketch family's promise, certified. q472
  * is the randomization test (Fisher 1935, hash-rerandomized form):
  * 100 deterministic md5 re-assignments of the urgent/rest split,
  * the observed mean-price gap ranked among the null gaps, add-one
  * p-value — the nonparametric twin of q186/q309, RNG-free like
  * q238's bootstrap. q473 aligns each user's event-type sequence
  * against a design funnel pattern with Needleman–Wunsch (1970)
  * global alignment (match +2, mismatch/gap −1): the DP row rebuilds
  * per event as an in-row scan, score bounds certified per user, and
  * the oracle replays the identical DP with the inner row-scan
  * UNROLLED per pattern position (DuckDB's list_reduce remains
  * off-limits, q389).
  */
object EmpiricalQueries {

  private val Pattern = Seq("signup", "view", "click", "view", "click", "purchase")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G416: the LSH S-curve, measured vs theory ──────────────────────
    "q471_lsh_scurve" -> ((s, dir) => {
      // pair universe: a hash sample (the low-J mass) UNION the known
      // dup pairs (the high-J tail random sampling can't reach) —
      // S-curve coverage at both ends, the sparse middle honest
      val sampPairs = {
        val ids = Tables.documents(s, dir)
          .filter(expr("pmod(md5_60(concat('scurve:', cast(doc_id as string))), 20) = 0"))
          .select(col("doc_id"))
        ids.as("a").join(ids.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      }
      val dupPairs = FeatureQueries.dupPairsTable(s, dir)
        .select(col("doc_a").as("ida"), col("doc_b").as("idb"))
      val pairIds = sampPairs.unionByName(dupPairs).distinct()
      // fresh family over universe docs ONLY (sample docs + dup docs —
      // a sliver of the corpus at any scale): HOF minhash is fine here,
      // the corpus-wide scan stays on the codegen'd minhash_sigs kernel.
      // Join documents down to the universe FIRST, THEN shingle — the
      // r10 draft shingled the whole corpus before the join pruned it
      // (and `docs` feeds both pair sides, so that ran twice: 9.1 s of
      // bench for a ~5% universe).
      import graft.functions.TextFunctions.{hashArray, minChunk, bandBucket}
      val univ = pairIds
        .select(explode(array(col("ida"), col("idb"))).as("doc_id")).distinct()
      val sigCols =
        (0 until 4).map(j => minChunk(col("h0"), j).as(s"f$j")) ++
        (0 until 4).map(j => minChunk(col("h1"), j).as(s"f${j + 4}"))
      // land the universe-doc signature sliver ONCE — it feeds three
      // consumers below (both pair sides + the token table) and Spark
      // shares no subplans across a DAG, so without landing it the
      // shingle+minhash pass (interpreted HOFs — fine once, not 3×)
      // re-ran per consumer (9-10 s of r10/r11 bench)
      val docsPath = PipelineQueries.cachedFixture(s"scurve|$dir") { work =>
        // spread (r15, VERDICT r14 "next" #9): the fixture build is
        // itself a query plan priced into run 1 — the shingle transform
        // + two hashArray passes ran inside the single-task scan-join
        // stage; fan the universe docs out before the per-row work
        graft.ops.Relational.spread(
          univ.join(Tables.documents(s, dir), "doc_id")
            .select(col("doc_id"), col("text")))
          .select(col("doc_id"), expr(
            s"array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), " +
              "i -> substring(text, i, 5)))").as("sh"))
          .withColumn("h0", hashArray(col("sh"), "sc0:"))
          .withColumn("h1", hashArray(col("sh"), "sc1:"))
          .select((col("doc_id") +: col("sh") +: sigCols): _*)
          .withColumn("fb0", bandBucket((0 until 4).map(j => col(s"f$j"))))
          .withColumn("fb1", bandBucket((4 until 8).map(j => col(s"f$j"))))
          .select("doc_id", "sh", "fb0", "fb1")
          .write.mode("overwrite").parquet(s"$work/docs")
      }
      // spread: the fixture lands as one file, and the shingle explode
      // feeding the intersection join otherwise runs in one scan task
      val docs = graft.ops.Relational.spread(s.read.parquet(s"$docsPath/docs"))
      // exact |A∩B| via token explode-join (codegen end to end) — the
      // r10 draft intersected the two shingle arrays row-wise
      // (ArrayIntersect is CodegenFallback: a boxed hash set of ~300
      // UTF8Strings per side per pair = 10 s of bench); here side A
      // explodes once per (pair, shingle) and hash-joins side B's doc
      // token table, so the intersection count is one shuffle of
      // narrow rows — the same shape a corpus-scale verify stage uses
      // (q144's discipline)
      // localCheckpoint (optimization r15, guide §3.3): `base` feeds the
      // shingle-explode intersect AND the final pair assembly — lazy,
      // the two signature joins ran twice. spreadCompute before the
      // explode (guide §2): AQE coalesces the byte-tiny pair frame to
      // one partition, so the ~300×|pairs| shingle fan-out ran inside
      // ONE task (profiled: a 2.13 s single-task stage, the query's
      // dominant stage).
      val base = pairIds
        .join(docs.select(col("doc_id").as("ida"), col("sh").as("asha"),
          col("fb0").as("ab0"), col("fb1").as("ab1")), "ida")
        .join(docs.select(col("doc_id").as("idb"), expr("size(sh)").as("nb"),
          col("fb0").as("bb0"), col("fb1").as("bb1")), "idb")
        .select(col("ida"), col("idb"), col("asha"),
          expr("size(asha)").as("na"), col("nb"),
          expr("case when ab0 = bb0 or ab1 = bb1 then 1L else 0L end")
            .as("collide"))
        .localCheckpoint()
      val docTok = docs.select(col("doc_id").as("idb"),
        explode(col("sh")).as("t"))
      val interCnt = graft.ops.Relational.spreadCompute(
          base.select(col("ida"), col("idb"), col("asha")))
        .select(col("ida"), col("idb"), explode(col("asha")).as("t"))
        .join(docTok, Seq("idb", "t"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
      val pairs = base.drop("asha")
        .join(interCnt, Seq("ida", "idb"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .withColumn("j_e6", expr("inter * 1000000 div (na + nb - inter)"))
        .withColumn("j2", expr("j_e6 * j_e6 div 1000000"))
        .withColumn("j4", expr("j2 * j2 div 1000000"))
        .withColumn("p_e6", expr(
          "1000000 - (1000000 - j4) * (1000000 - j4) div 1000000"))
        .withColumn("bucket", expr("least(j_e6 div 50000, 19L)"))
      pairs.groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"), sum("collide").as("n_collide"),
          sum("p_e6").as("sp"))
        .withColumn("measured_e4", expr("n_collide * 10000 div n_pairs"))
        .withColumn("theory_e4", expr("sp div (n_pairs * 100)"))
        .withColumn("gap_e4", expr("measured_e4 - theory_e4"))
        .select("bucket", "n_pairs", "n_collide", "measured_e4", "theory_e4",
          "gap_e4")
        .orderBy("bucket")
    }),

    // ── G417: hash-rerandomized permutation test ───────────────────────
    // The null re-assignment is md5(salt:key) parity — group sizes
    // float binomially, which makes this a RERANDOMIZATION test (the
    // valid, modern form) rather than an exact permutation; the
    // statistic is the |mean difference| at e6 with the division
    // truncation mirrored, and the add-one p-value keeps the test
    // level exact under determinism. The group sums are lifted to
    // DECIMAL(38,0) (HUGEINT in the oracle) before the e6 scale: the
    // BIGINT form Σx·1e6 wraps at ~9.2e12 cents of group mass — about
    // 4× the sf0.1 corpus, found by the r14 ScaleProbe's 8× fixture —
    // while the per-group MEANS the statistic compares always fit
    // (commit 5b1700b's overflow-lift discipline).
    "q472_permutation_test" -> ((s, dir) => {
      // spread: the 100× explode + md5 group assignment below otherwise
      // runs inside the single-row-group scan's ONE task (guide §2.5) —
      // measured 6.3 s of a 6.6 s query serialized on one core
      val o = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("x"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("isa"))
      val obs = o.agg(
          sum(expr("case when isa = 1L then x else 0L end")).as("sa"),
          sum("isa").as("na"),
          sum(expr("case when isa = 0L then x else 0L end")).as("sb"),
          sum(expr("1L - isa")).as("nb"))
        .select(expr("abs(cast(sa as decimal(38,0)) * 1000000 div na " +
          "- cast(sb as decimal(38,0)) * 1000000 div nb)")
          .as("d_obs_e6"))
      val perms = o.select(col("k"), col("x"),
          explode(expr("sequence(1, 100)")).as("r"))
        .withColumn("g", expr(
          "pmod(md5_60(concat(cast(r as string), ':', cast(k as string))), 2)"))
        .groupBy("r")
        .agg(sum(expr("case when g = 0 then x else 0L end")).as("sa"),
          sum(expr("case when g = 0 then 1L else 0L end")).as("na"),
          sum(expr("case when g = 1 then x else 0L end")).as("sb"),
          sum(expr("case when g = 1 then 1L else 0L end")).as("nb"))
        .select(expr("abs(cast(sa as decimal(38,0)) * 1000000 div na " +
          "- cast(sb as decimal(38,0)) * 1000000 div nb)")
          .as("d_e6"))
      perms.crossJoin(broadcast(obs))
        .agg(max("d_obs_e6").as("d_obs_e6"), count(lit(1)).as("n_perm"),
          sum(expr("case when d_e6 >= d_obs_e6 then 1L else 0L end"))
            .as("n_ge"),
          max("d_e6").as("d_null_max_e6"))
        .withColumn("p_e4", expr("(1 + n_ge) * 10000 div (n_perm + 1)"))
        .withColumn("reject_05", expr(
          "case when p_e4 <= 500L then 1L else 0L end"))
        .select("d_obs_e6", "d_null_max_e6", "n_perm", "n_ge", "p_e4",
          "reject_05")
    }),

    // ── G418: Needleman–Wunsch funnel alignment per user ───────────────
    "q473_nw_alignment" -> ((s, dir) => {
      val pat = Pattern.map(p => s"'$p'").mkString(", ")
      val m = Pattern.length
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("et"))
      // row rebuild: new[0] = old[0]−1; new[j] = max(old[j]−1,
      // new[j−1]−1, old[j−1] + score(et, P[j])) — the inner scan is a
      // growing-array fold over pattern positions
      // spreadCompute: the O(events·m) NW fold below sits on a byte-tiny
      // collected frame AQE coalesces to one task (q474's finding)
      val perUser = graft.ops.Relational.spreadCompute(
        ev.groupBy("u")
          .agg(expr("array_sort(collect_list(struct(us, eid, et)))").as("xs"),
            count(lit(1)).as("n_u")))
        .withColumn("row", expr(
          s"""aggregate(xs,
             |  transform(sequence(0, $m), j -> cast(-j as bigint)),
             |  (acc, z) -> aggregate(sequence(1, $m),
             |    array(element_at(acc, 1) - 1L),
             |    (nr, j) -> concat(nr, array(greatest(
             |      element_at(acc, j + 1) - 1L,
             |      element_at(nr, j) - 1L,
             |      element_at(acc, j) + (case when z.et =
             |          element_at(array($pat), j)
             |        then 2L else -1L end))))))""".stripMargin))
        .withColumn("score", expr(s"element_at(row, $m + 1)"))
        .select(col("u"), col("n_u"), col("score"),
          expr(s"case when score > 2 * least(n_u, cast($m as bigint)) " +
            "then 1L else 0L end").as("over_max"),
          expr(s"case when score < -(n_u + $m) then 1L else 0L end")
            .as("under_min"),
          expr("md5_60(concat(cast(u as string), ':', cast(score as string)))")
            .as("rc"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum("n_u").as("n_events"),
          sum("score").as("score_total"),
          max("score").as("score_max"), min("score").as("score_min"),
          sum("over_max").as("n_over_max"), sum("under_min").as("n_under_min"),
          expr("bit_xor(rc)").as("xor60_scores"))
        .withColumn("mean_score_e2", expr("score_total * 100 div n_users"))
        .select("n_users", "n_events", "score_total", "mean_score_e2",
          "score_max", "score_min", "n_over_max", "n_under_min",
          "xor60_scores")
    })
  )

  def oracleSql: Map[String, String] = {
    // q473: the inner row scan unrolled per pattern position
    val m = Pattern.length
    def cell(j: Int): String =
      if (j == 0) "r.row[1] - 1"
      else s"GREATEST(r.row[${j + 1}] - 1, (${cell(j - 1)}) - 1, " +
        s"r.row[$j] + (CASE WHEN s.et = '${Pattern(j - 1)}' THEN 2 ELSE -1 END))"
    val rowNew = (0 to m).map(j => s"(${cell(j)})").mkString(", ")
    Map(

    "q471_lsh_scurve" ->
      (TextQueries.sigCte +
        s""",
        |shs AS (SELECT d.doc_id,
        |    list_distinct(${graft.functions.TextFunctions.sqlShingles("d.text", 5)}) AS sh
        |  FROM documents d),
        |sids AS (SELECT doc_id FROM documents
        |  WHERE CAST('0x' || substr(md5('scurve:' || CAST(doc_id AS VARCHAR)),
        |    1, 15) AS BIGINT) % 20 = 0),
        |bands AS (SELECT doc_id, 0 AS band_id, b0 AS bucket FROM sigs
        |          UNION ALL SELECT doc_id, 1, b1 FROM sigs),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM bands x JOIN bands y
        |           ON x.band_id = y.band_id AND x.bucket = y.bucket
        |             AND x.doc_id < y.doc_id),
        |wt AS (SELECT doc_id,
        |    list_distinct(${graft.functions.TextFunctions.sqlTokens("text")})
        |      AS ts FROM documents),
        |dup AS (SELECT doc_a AS ida, doc_b AS idb
        |  FROM cand JOIN wt a ON doc_a = a.doc_id JOIN wt b ON doc_b = b.doc_id
        |  WHERE len(list_intersect(a.ts, b.ts)) * 1000000
        |    // (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
        |    >= 200000),
        |pu AS (SELECT a.doc_id AS ida, b.doc_id AS idb
        |    FROM sids a JOIN sids b ON a.doc_id < b.doc_id
        |  UNION SELECT ida, idb FROM dup),
        |uni AS (SELECT ida AS doc_id FROM pu UNION SELECT idb FROM pu),
        |fu AS (SELECT s.doc_id, s.sh,
        |    list_transform(s.sh, x -> md5('sc0:'||x)) AS h0,
        |    list_transform(s.sh, x -> md5('sc1:'||x)) AS h1
        |  FROM shs s JOIN uni u ON s.doc_id = u.doc_id),
        |fsg AS (SELECT doc_id, sh,
        |    ${(0 until 4).map(j => graft.functions.TextFunctions.sqlMinChunk("h0", j) + s" AS f$j").mkString(", ")},
        |    ${(0 until 4).map(j => graft.functions.TextFunctions.sqlMinChunk("h1", j) + s" AS f${j + 4}").mkString(", ")}
        |  FROM fu),
        |fb AS (SELECT doc_id, sh,
        |    ${graft.functions.TextFunctions.sqlBandBucket((0 until 4).map(j => s"f$j"))} AS fb0,
        |    ${graft.functions.TextFunctions.sqlBandBucket((4 until 8).map(j => s"f$j"))} AS fb1
        |  FROM fsg),
        |pr AS (SELECT len(list_intersect(a.sh, b.sh)) AS inter,
        |    len(a.sh) AS na, len(b.sh) AS nb,
        |    CASE WHEN a.fb0 = b.fb0 OR a.fb1 = b.fb1 THEN 1 ELSE 0 END AS collide
        |  FROM pu JOIN fb a ON pu.ida = a.doc_id
        |  JOIN fb b ON pu.idb = b.doc_id),
        |jj AS (SELECT collide, inter * 1000000 // (na + nb - inter) AS j_e6
        |       FROM pr),
        |th AS (SELECT collide, j_e6,
        |    (j_e6 * j_e6 // 1000000) AS j2 FROM jj),
        |t4 AS (SELECT collide, j_e6, j2 * j2 // 1000000 AS j4 FROM th),
        |pp AS (SELECT collide, j_e6,
        |    1000000 - (1000000 - j4) * (1000000 - j4) // 1000000 AS p_e6,
        |    LEAST(j_e6 // 50000, 19) AS bucket
        |  FROM t4)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(collide) AS BIGINT) AS n_collide,
        |  CAST(SUM(collide) * 10000 // COUNT(*) AS BIGINT) AS measured_e4,
        |  CAST(SUM(p_e6) // (COUNT(*) * 100) AS BIGINT) AS theory_e4,
        |  CAST(SUM(collide) * 10000 // COUNT(*)
        |    - SUM(p_e6) // (COUNT(*) * 100) AS BIGINT) AS gap_e4
        |FROM pp GROUP BY bucket ORDER BY bucket""".stripMargin),

    "q472_permutation_test" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS isa
        |  FROM orders),
        |obs AS (SELECT ABS(
        |    CAST(SUM(CASE WHEN isa = 1 THEN x ELSE 0 END) AS HUGEINT) * 1000000
        |      // SUM(isa)
        |    - CAST(SUM(CASE WHEN isa = 0 THEN x ELSE 0 END) AS HUGEINT) * 1000000
        |      // SUM(1 - isa)) AS d_obs_e6
        |  FROM o),
        |pm AS (SELECT r.r, o.k, o.x,
        |    CAST('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
        |      || CAST(o.k AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS g
        |  FROM o, (SELECT UNNEST(range(1, 101)) AS r) r),
        |pd AS (SELECT r,
        |    ABS(CAST(SUM(CASE WHEN g = 0 THEN x ELSE 0 END) AS HUGEINT) * 1000000
        |        // SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |      - CAST(SUM(CASE WHEN g = 1 THEN x ELSE 0 END) AS HUGEINT) * 1000000
        |        // SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)) AS d_e6
        |  FROM pm GROUP BY r)
        |SELECT CAST(obs.d_obs_e6 AS BIGINT) AS d_obs_e6,
        |  CAST(MAX(pd.d_e6) AS BIGINT) AS d_null_max_e6,
        |  CAST(COUNT(*) AS BIGINT) AS n_perm,
        |  CAST(SUM(CASE WHEN pd.d_e6 >= obs.d_obs_e6 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ge,
        |  CAST((1 + SUM(CASE WHEN pd.d_e6 >= obs.d_obs_e6 THEN 1 ELSE 0 END))
        |    * 10000 // (COUNT(*) + 1) AS BIGINT) AS p_e4,
        |  CAST(CASE WHEN (1 + SUM(CASE WHEN pd.d_e6 >= obs.d_obs_e6
        |    THEN 1 ELSE 0 END)) * 10000 // (COUNT(*) + 1) <= 500
        |    THEN 1 ELSE 0 END AS BIGINT) AS reject_05
        |FROM pd, obs GROUP BY obs.d_obs_e6""".stripMargin,

    "q473_nw_alignment" ->
      s"""WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid, event_type AS et FROM events),
        |seq AS (SELECT u, et,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |nu AS (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, 0::BIGINT AS i,
        |    list_transform(range(0, ${m + 1}), j -> -j) AS row
        |  FROM nu
        |  UNION ALL
        |  SELECT s.u, s.i, [$rowNew]::BIGINT[]
        |  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1),
        |fin AS (SELECT r.u, nu.n_u, r.row[${m + 1}] AS score
        |        FROM rec r JOIN nu ON r.u = nu.u WHERE r.i = nu.n_u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_u) AS BIGINT) AS n_events,
        |  CAST(SUM(score) AS BIGINT) AS score_total,
        |  CAST(SUM(score) * 100 // COUNT(*) AS BIGINT) AS mean_score_e2,
        |  CAST(MAX(score) AS BIGINT) AS score_max,
        |  CAST(MIN(score) AS BIGINT) AS score_min,
        |  CAST(SUM(CASE WHEN score > 2 * LEAST(n_u, $m) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_max,
        |  CAST(SUM(CASE WHEN score < -(n_u + $m) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_under_min,
        |  bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |    CAST(score AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_scores
        |FROM fin""".stripMargin
    )
  }
}
