package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-design advisors and estimator certificates (round 10,
  * fifty-eighth wave): a zone-map skip audit that prices clustering in
  * scan rows, a correlated-subquery decorrelation certificate, an RLE
  * layout advisor, and inverse-propensity offline policy evaluation.
  *
  * Reference intent: the reference stores everything as unclustered
  * PostgreSQL tables and evaluates its recommendations online only
  * (services/web-ui reads live forecasts). q405 measures what a
  * min/max zone map (the parquet row-group / Delta file-stats
  * mechanism that q159's clustering-depth and q226's partition
  * pruning feed) actually buys: files skipped and scan amplification
  * under a clustered vs hash layout, with the no-false-skip invariant
  * held as data. q406 certifies the planner identity every SQL user
  * leans on: a correlated scalar subquery IS its decorrelated
  * groupBy-join rewrite — both run, both checksummed. q407 prices RLE
  * encoding under three physical orders (the OPTIMIZE/ZORDER
  * economics q250 priced for dictionaries). q408 is the Li et al.
  * replay / IPS estimator family over the event log — the offline
  * eval a recommendation policy ships behind.
  */
object AdvisorQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G350: zone-map skip audit (clustered vs hash layout) ───────────
    // 64 files per layout. Zone column: ship-day offset. Clustered =
    // equal-width day bins (what a sort/OPTIMIZE lands); hash =
    // ingestion-order proxy (md5 of the row key). Predicate: the
    // data-anchored 30-day band starting at 40 % of the span. Per
    // layout: files skipped by min/max alone, rows scanned in the
    // survivors, scan amplification vs the qualifying rows, and the
    // invariant that makes skipping SOUND — zero qualifying rows in
    // skipped files. One exchange: both layouts melt into one
    // (layout, file) grain aggregate.
    "q405_zonemap_skip" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          to_date(col("l_shipdate")).as("sd"))
      val span = li.agg(min("sd").as("d0"), max("sd").as("d1"))
        .select(col("d0"), datediff(col("d1"), col("d0")).cast("long").as("sp"))
      val rows = li.crossJoin(broadcast(span))
        .select(datediff(col("sd"), col("d0")).cast("long").as("day"),
          col("ok"), col("ln"), col("sp"),
          expr("sp * 4 div 10").as("lo"), expr("sp * 4 div 10 + 29").as("hi"))
        .select(col("day"), col("lo"), col("hi"),
          explode(expr(
            """array(
              |  named_struct('layout', 'clustered', 'f', day * 64 div (sp + 1)),
              |  named_struct('layout', 'hash', 'f',
              |    pmod(md5_60(concat(cast(ok as string), ':', cast(ln as string))), 64)))"""
              .stripMargin)).as("z"))
        .select(col("day"), col("lo"), col("hi"),
          expr("z.layout").as("layout"), expr("z.f").as("f"),
          when(col("day").between(col("lo"), col("hi")), 1L).otherwise(0L).as("q"))
      val perFile = rows.groupBy("layout", "f")
        .agg(min("day").as("mn"), max("day").as("mx"),
          count(lit(1)).as("n"), sum("q").as("nq"),
          max("lo").as("lo"), max("hi").as("hi"))
        .withColumn("skipped",
          when(col("mx") < col("lo") || col("mn") > col("hi"), 1L).otherwise(0L))
      perFile.groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum("skipped").as("n_skipped"),
          sum("n").as("rows_total"),
          sum(expr("case when skipped = 1 then 0 else n end")).as("rows_scanned"),
          sum("nq").as("rows_qualifying"),
          sum(expr("case when skipped = 1 then nq else 0 end")).as("n_false_skips"))
        .withColumn("skip_share_e4", expr("n_skipped * 10000 div n_files"))
        .withColumn("scan_amp_e2", expr(
          "rows_scanned * 100 div greatest(rows_qualifying, 1)"))
        .orderBy("layout")
    }),

    // ── G351: correlated-subquery decorrelation certificate ────────────
    // "Orders above their customer's average price" in BOTH shapes: the
    // correlated scalar-subquery form (two per-row subqueries on the
    // same key — Spark's DecorrelateInnerQuery rewrites them into
    // aggregate joins) and the hand-decorrelated groupBy-join form.
    // Cross-multiplied (p·n > Σp) so the average never materializes —
    // exact integers end to end. Certificate: identical row counts and
    // identical md5₆₀-xor over the qualifying order keys. DuckDB runs
    // both shapes independently — three planners, one answer.
    "q406_decorrelate_certificate" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("p"))
      o.createOrReplaceTempView("q406_orders")
      val sub = s.sql(
        """SELECT k FROM q406_orders o
          |WHERE p * (SELECT count(*) FROM q406_orders i WHERE i.c = o.c)
          |        > (SELECT sum(p)   FROM q406_orders i WHERE i.c = o.c)"""
          .stripMargin)
      val agg = o.groupBy("c").agg(count(lit(1)).as("n"), sum("p").as("sp"))
      val join = o.join(agg, "c")
        .filter(col("p") * col("n") > col("sp")).select("k")
      val sig = (d: DataFrame, cn: String, xn: String) => d.agg(
        count(lit(1)).as(cn),
        expr("bit_xor(md5_60(cast(k as string)))").as(xn))
      sig(sub, "n_subquery", "xor60_subquery")
        .crossJoin(broadcast(sig(join, "n_join", "xor60_join")))
        .withColumn("match", expr(
          """case when n_subquery = n_join
            |       and xor60_subquery = xor60_join then 1L else 0L end"""
            .stripMargin))
        .select("n_subquery", "n_join", "xor60_subquery", "xor60_join", "match")
    }),

    // ── G352: RLE layout advisor (runs under three physical orders) ────
    // Columns: l_returnflag (3 values), l_linestatus (2), ship-day
    // (~2.4 k). Layouts: 'time' (day-clustered — the lake default),
    // 'self' (sorted by the column itself — best case), 'hash'
    // (ingestion order — worst case). The file count is DATA-DERIVED
    // (VERDICT r13 "next" #4): nf = the power-of-2 ceiling of
    // ⌈n/9375⌉, clamped to ≥4 — 64 files at sf0.1's 600k rows, and at
    // 100× the data the per-(layout, c, f) window partition stays
    // ~9.4k rows instead of growing 100× against a pinned 64 (a real
    // OPTIMIZE advisor scales file count with data; same self-scaling
    // rule as q569's bucket bits). A run breaks at every intra-file
    // value change; RLE bytes price each run at len(value) + 4. All
    // windows are (layout, column, file)-partitioned — file-bounded,
    // never corpus-wide. The 9-row output is the table a table-format
    // OPTIMIZE policy reads.
    "q407_rle_advisor" -> ((s, dir) => {
      // spread: the 9× explode + per-row md5 otherwise run inside the
      // single-row-group scan's one task (guide §2.5)
      val li = graft.ops.Relational.spread(Tables.lineitem(s, dir))
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          to_date(col("l_shipdate")).as("sd"),
          col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      val nfLadder = "(case " + (16 to 3 by -1).map(b =>
        s"when m > ${1L << (b - 1)}L then ${1L << b}L").mkString(" ") +
        " else 4L end)"
      val span = li.agg(min("sd").as("d0"), max("sd").as("d1"),
          count(lit(1)).as("nrows"))
        .select(col("d0"), datediff(col("d1"), col("d0")).cast("long").as("sp"),
          expr("(nrows + 9374) div 9375").as("m"))
        .select(col("d0"), col("sp"), expr(nfLadder).as("nf"))
      val base = li.crossJoin(broadcast(span))
        .select(col("ok"), col("ln"),
          datediff(col("sd"), col("d0")).cast("long").as("day"), col("sp"),
          col("nf"), col("rf"), col("ls"),
          expr("md5_60(concat(cast(ok as string), ':', cast(ln as string)))").as("h"))
        .select(col("ok"), col("ln"), col("day"), col("sp"), col("nf"), col("h"),
          explode(expr(
            """array(named_struct('c', 'returnflag', 'v', rf),
              |      named_struct('c', 'linestatus', 'v', ls),
              |      named_struct('c', 'day', 'v', cast(day as string)))"""
              .stripMargin)).as("z"))
        .select(col("ok"), col("ln"), col("day"), col("sp"), col("nf"), col("h"),
          expr("z.c").as("c"), expr("z.v").as("v"))
        .select(col("c"), col("v"),
          explode(expr(
            """array(
              |  named_struct('layout', 'time', 'f', day * nf div (sp + 1),
              |               'p1', day, 'p2', cast(null as string)),
              |  named_struct('layout', 'self', 'f', pmod(md5_60(v), nf),
              |               'p1', cast(null as bigint), 'p2', v),
              |  named_struct('layout', 'hash', 'f', pmod(h, nf),
              |               'p1', h, 'p2', cast(null as string)))"""
              .stripMargin)).as("y"),
          col("ok"), col("ln"))
        .select(col("c"), col("v"), expr("y.layout").as("layout"),
          expr("y.f").as("f"), expr("y.p1").as("p1"), expr("y.p2").as("p2"),
          col("ok"), col("ln"))
      // (ok, ln) is NOT unique in this corpus (duplicate l_linenumber
      // within an order — q389's finding), so v itself is the final
      // tie-break: rows identical in (keys, v) are interchangeable and
      // the run count becomes order-independent.
      val w = Window.partitionBy("layout", "c", "f")
        .orderBy(col("p1").asc_nulls_first, col("p2").asc_nulls_first,
          col("ok").asc, col("ln").asc, col("v").asc)
      // user-pinned window exchange: AQE's byte-based coalescing folded
      // the 5.4M-row window input into 3 partitions (measured 5.3 s
      // 3-task sort stage) — per-row sort+window cost is what matters
      // here, so pin CPU-sized partitioning on the window keys (an
      // explicit repartition is never coalesced; the window reuses it,
      // adding no second exchange)
      base
        .repartition(s.sparkContext.defaultParallelism,
          col("layout"), col("c"), col("f"))
        .withColumn("brk", when(
          lag(col("v"), 1).over(w).isNull ||
            lag(col("v"), 1).over(w) =!= col("v"), 1L).otherwise(0L))
        .groupBy("layout", "c")
        .agg(sum("brk").as("n_runs"),
          count(lit(1)).as("n_rows"),
          sum(length(col("v")).cast("long")).as("plain_bytes"),
          sum(when(col("brk") === 1L,
            length(col("v")).cast("long") + 4L).otherwise(0L)).as("rle_bytes"))
        .withColumn("ratio_e2", expr("plain_bytes * 100 div rle_bytes"))
        .orderBy("c", "layout")
    }),

    // ── G353: IPS / replay offline policy evaluation ───────────────────
    // Log: every event is (context u, action a, reward r) with r = 1
    // iff the same user purchases within 1 h after it (per-user
    // partitioned forward-min window — never global). Target policy
    // π(u) = the user's modal event type (tie → lexicographic).
    // Logging propensities are the action marginals n_a/n. Estimates,
    // all exact-integer e6: behavior value Σr/n; replay (Li et al.)
    // mean reward over matched rows; IPS Σ_matched r·(n/n_a)/n, which
    // telescopes to Σ_a r_a/n_a — evaluated per action then summed, 5
    // truncating divs total. w_max_e4 discloses the worst importance
    // weight (the OPE variance diagnostic). The oracle replays every
    // estimator relationally.
    "q408_ips_policy_eval" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), col("event_type").as("a"),
          unix_micros(col("ts")).as("us"), col("event_id").as("eid"))
      val wNext = Window.partitionBy("u")
        .orderBy(col("us").asc, col("eid").asc)
        .rowsBetween(1, Window.unboundedFollowing)
      val rewarded = ev
        .withColumn("np", min(when(col("a") === "purchase", col("us"))).over(wNext))
        .withColumn("r", when(
          col("np").isNotNull && col("np") <= col("us") + 3600000000L, 1L)
          .otherwise(0L))
      val wPi = Window.partitionBy("u")
        .orderBy(col("cnt").desc, col("a").asc)
      val pi = ev.groupBy("u", "a").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wPi))
        .filter(col("rk") === 1).select(col("u"), col("a").as("pi_a"))
      val na = ev.groupBy("a").agg(count(lit(1)).as("n_a"))
      val scored = rewarded.join(pi, "u").join(broadcast(na), "a")
        .withColumn("m", when(col("a") === col("pi_a"), 1L).otherwise(0L))
      val perA = scored.groupBy("a")
        .agg(max("n_a").as("n_a"), sum(expr("m * r")).as("r_a"),
          sum("m").as("m_a"), sum("r").as("rall_a"), count(lit(1)).as("n_rows_a"))
      perA.agg(
          sum("n_rows_a").as("n"),
          sum("m_a").as("n_matched"),
          sum("rall_a").as("r_total"),
          sum("r_a").as("r_matched"),
          sum(expr("r_a * 1000000 div n_a")).as("v_ips_e6"))
        .withColumn("v_behavior_e6", expr("r_total * 1000000 div n"))
        .withColumn("v_replay_e6", expr(
          "r_matched * 1000000 div greatest(n_matched, 1)"))
        .withColumn("match_e4", expr("n_matched * 10000 div n"))
        .select("n", "n_matched", "match_e4", "v_behavior_e6",
          "v_replay_e6", "v_ips_e6")
        .crossJoin(broadcast(
          na.agg(sum("n_a").as("nn"), min("n_a").as("na_min"))
            .select(expr("nn * 10000 div na_min").as("w_max_e4"))))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q405_zonemap_skip" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(l_shipdate AS DATE) AS sd FROM lineitem),
        |span AS (SELECT MIN(sd) AS d0,
        |    date_diff('day', MIN(sd), MAX(sd)) AS sp FROM li),
        |rows0 AS (SELECT date_diff('day', d0, sd) AS day, ok, ln, sp,
        |    sp * 4 // 10 AS lo, sp * 4 // 10 + 29 AS hi FROM li, span),
        |melt AS (
        |  SELECT day, lo, hi, 'clustered' AS layout, day * 64 // (sp + 1) AS f,
        |    CASE WHEN day BETWEEN lo AND hi THEN 1 ELSE 0 END AS q FROM rows0
        |  UNION ALL
        |  SELECT day, lo, hi, 'hash' AS layout,
        |    CAST('0x' || substr(md5(CAST(ok AS VARCHAR) || ':' ||
        |      CAST(ln AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS f,
        |    CASE WHEN day BETWEEN lo AND hi THEN 1 ELSE 0 END AS q FROM rows0),
        |pf AS (SELECT layout, f, MIN(day) AS mn, MAX(day) AS mx,
        |    COUNT(*) AS n, SUM(q) AS nq, MAX(lo) AS lo, MAX(hi) AS hi
        |  FROM melt GROUP BY layout, f),
        |pf2 AS (SELECT *, CASE WHEN mx < lo OR mn > hi THEN 1 ELSE 0 END
        |    AS skipped FROM pf)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(skipped) AS BIGINT) AS n_skipped,
        |  CAST(SUM(n) AS BIGINT) AS rows_total,
        |  CAST(SUM(CASE WHEN skipped = 1 THEN 0 ELSE n END) AS BIGINT)
        |    AS rows_scanned,
        |  CAST(SUM(nq) AS BIGINT) AS rows_qualifying,
        |  CAST(SUM(CASE WHEN skipped = 1 THEN nq ELSE 0 END) AS BIGINT)
        |    AS n_false_skips,
        |  CAST(SUM(skipped) * 10000 // COUNT(*) AS BIGINT) AS skip_share_e4,
        |  CAST(SUM(CASE WHEN skipped = 1 THEN 0 ELSE n END) * 100
        |    // GREATEST(SUM(nq), 1) AS BIGINT) AS scan_amp_e2
        |FROM pf2 GROUP BY layout ORDER BY layout""".stripMargin,

    "q406_decorrelate_certificate" ->
      """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p FROM orders),
        |sub AS (SELECT k FROM o
        |  WHERE p * (SELECT COUNT(*) FROM o i WHERE i.c = o.c)
        |          > (SELECT SUM(p)   FROM o i WHERE i.c = o.c)),
        |agg AS (SELECT c, COUNT(*) AS n, SUM(p) AS sp FROM o GROUP BY c),
        |jn AS (SELECT o.k FROM o JOIN agg ON o.c = agg.c
        |       WHERE o.p * agg.n > agg.sp),
        |s1 AS (SELECT COUNT(*) AS n_subquery,
        |    bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
        |      AS BIGINT)) AS xor60_subquery FROM sub),
        |s2 AS (SELECT COUNT(*) AS n_join,
        |    bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
        |      AS BIGINT)) AS xor60_join FROM jn)
        |SELECT CAST(n_subquery AS BIGINT) AS n_subquery,
        |  CAST(n_join AS BIGINT) AS n_join, xor60_subquery, xor60_join,
        |  CAST(CASE WHEN n_subquery = n_join
        |    AND xor60_subquery = xor60_join THEN 1 ELSE 0 END AS BIGINT)
        |    AS match
        |FROM s1, s2""".stripMargin,

    "q407_rle_advisor" -> {
      // mirror of the engine's nfLadder: power-of-2 ceiling of
      // ⌈n/9375⌉ clamped to ≥4 (64 at sf0.1's 600k lineitem rows)
      val nfLadderSql = "(CASE " + (16 to 3 by -1).map(b =>
        s"WHEN m > ${1L << (b - 1)} THEN ${1L << b}").mkString(" ") +
        " ELSE 4 END)"
      s"""WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(l_shipdate AS DATE) AS sd, l_returnflag AS rf,
        |    l_linestatus AS ls FROM lineitem),
        |span AS (SELECT d0, sp, $nfLadderSql AS nf FROM
        |  (SELECT MIN(sd) AS d0, date_diff('day', MIN(sd), MAX(sd)) AS sp,
        |    (COUNT(*) + 9374) // 9375 AS m FROM li)),
        |b0 AS (SELECT ok, ln, date_diff('day', d0, sd) AS day, sp, nf, rf, ls,
        |    CAST('0x' || substr(md5(CAST(ok AS VARCHAR) || ':' ||
        |      CAST(ln AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM li, span),
        |cols AS (
        |  SELECT ok, ln, day, sp, nf, h, 'returnflag' AS c, rf AS v FROM b0
        |  UNION ALL
        |  SELECT ok, ln, day, sp, nf, h, 'linestatus' AS c, ls AS v FROM b0
        |  UNION ALL
        |  SELECT ok, ln, day, sp, nf, h, 'day' AS c, CAST(day AS VARCHAR) AS v
        |  FROM b0),
        |lay AS (
        |  SELECT c, v, 'time' AS layout, day * nf // (sp + 1) AS f,
        |    day AS p1, CAST(NULL AS VARCHAR) AS p2, ok, ln FROM cols
        |  UNION ALL
        |  SELECT c, v, 'self' AS layout,
        |    CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) % nf AS f,
        |    CAST(NULL AS BIGINT) AS p1, v AS p2, ok, ln FROM cols
        |  UNION ALL
        |  SELECT c, v, 'hash' AS layout, h % nf AS f, h AS p1,
        |    CAST(NULL AS VARCHAR) AS p2, ok, ln FROM cols),
        |mark AS (SELECT layout, c, v,
        |    CASE WHEN LAG(v) OVER (PARTITION BY layout, c, f
        |        ORDER BY p1 ASC NULLS FIRST, p2 ASC NULLS FIRST, ok, ln, v)
        |      IS DISTINCT FROM v THEN 1 ELSE 0 END AS brk
        |  FROM lay)
        |SELECT layout, c, CAST(SUM(brk) AS BIGINT) AS n_runs,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(length(v)) AS BIGINT) AS plain_bytes,
        |  CAST(SUM(CASE WHEN brk = 1 THEN length(v) + 4 ELSE 0 END)
        |    AS BIGINT) AS rle_bytes,
        |  CAST(SUM(length(v)) * 100 //
        |    SUM(CASE WHEN brk = 1 THEN length(v) + 4 ELSE 0 END) AS BIGINT)
        |    AS ratio_e2
        |FROM mark GROUP BY layout, c ORDER BY c, layout""".stripMargin
    },

    "q408_ips_policy_eval" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS a,
        |    epoch_us(ts) AS us, event_id AS eid FROM events),
        |rw AS (SELECT u, a, us, eid,
        |    MIN(CASE WHEN a = 'purchase' THEN us END) OVER
        |      (PARTITION BY u ORDER BY us, eid
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM ev),
        |rwd AS (SELECT u, a,
        |    CASE WHEN np IS NOT NULL AND np <= us + 3600000000 THEN 1
        |         ELSE 0 END AS r FROM rw),
        |cnts AS (SELECT u, a, COUNT(*) AS cnt FROM ev GROUP BY u, a),
        |pi AS (SELECT u, a AS pi_a FROM (SELECT u, a,
        |      ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, a ASC)
        |        AS rk FROM cnts) z WHERE rk = 1),
        |na AS (SELECT a, COUNT(*) AS n_a FROM ev GROUP BY a),
        |sc AS (SELECT rwd.a, rwd.r, na.n_a,
        |    CASE WHEN rwd.a = pi.pi_a THEN 1 ELSE 0 END AS m
        |  FROM rwd JOIN pi ON rwd.u = pi.u JOIN na ON rwd.a = na.a),
        |pa AS (SELECT a, MAX(n_a) AS n_a, SUM(m * r) AS r_a, SUM(m) AS m_a,
        |    SUM(r) AS rall_a, COUNT(*) AS n_rows_a FROM sc GROUP BY a),
        |tot AS (SELECT SUM(n_rows_a) AS n, SUM(m_a) AS n_matched,
        |    SUM(rall_a) AS r_total, SUM(r_a) AS r_matched,
        |    SUM(r_a * 1000000 // n_a) AS v_ips_e6 FROM pa),
        |wmax AS (SELECT (SELECT COUNT(*) FROM ev) * 10000 //
        |    (SELECT MIN(n_a) FROM na) AS w_max_e4)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_matched AS BIGINT) AS n_matched,
        |  CAST(n_matched * 10000 // n AS BIGINT) AS match_e4,
        |  CAST(r_total * 1000000 // n AS BIGINT) AS v_behavior_e6,
        |  CAST(r_matched * 1000000 // GREATEST(n_matched, 1) AS BIGINT)
        |    AS v_replay_e6,
        |  CAST(v_ips_e6 AS BIGINT) AS v_ips_e6,
        |  CAST(w_max_e4 AS BIGINT) AS w_max_e4
        |FROM tot, wmax""".stripMargin
  )
}
