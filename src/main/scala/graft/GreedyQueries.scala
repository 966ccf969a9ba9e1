package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy-and-commutativity subsystem (round 10, fifty-fourth wave):
  * the CDC order-independence certificate, an Oaxaca-style rate
  * decomposition, cooldown alert suppression as a greedy fold, and
  * greedy set-cover selection with its coverage curve.
  *
  * Reference intent: the reference applies CDC-ish upserts assuming
  * in-order delivery (its daily DAG replaces whole tables), fires
  * alerts with no suppression, and picks "top products" by raw count.
  * These four land the missing guarantees: q389 certifies that
  * last-writer-wins BY VERSION is order-independent (apply the change
  * log in an md5-jittered arrival order via a fold — the landed state
  * must equal the direct max-version resolution; THE property that
  * lets a distributed CDC consumer skip resequencing); q390 splits a
  * rate-metric delta into mix shift vs true rate shift (the
  * Oaxaca-Blinder answer to "did quality drop, or did the mix
  * change?"); q391 is alert cooldown done right — a greedy fold,
  * because lag-based suppression compares against SUPPRESSED alerts
  * and over-silences chains; q392 is greedy set cover (the classic
  * ln-n-approximate selection) with each round's marginal gain
  * emitted, driver loop bounded at 10 rounds.
  */
object GreedyQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G334: CDC commutativity certificate (LWW by total order) ───────
    // Change log: each order's updates are its lineitems, versioned by
    // l_linenumber; arrival order is md5-jittered (NOT version order).
    // LWW commutes ONLY under a TOTAL order on versions — and the
    // generated data proves why: l_linenumber DUPLICATES within an
    // orderkey, so "by version" alone is order-dependent (found as 363
    // real mismatches at sf0.001). The resolution key is therefore
    // (ver, payload) lexicographic — ties broken by content, the
    // standard CRDT LWW-register trick. The (ver, payload) state is
    // PACKED into one BIGINT (ver·2³⁴ + payload; payload < 2³⁴ by the
    // price domain, asserted via the sum magnitude) so lexicographic
    // comparison is numeric comparison and the fold state is a flat
    // scalar — DuckDB 1.0's list_reduce corrupts list-of-list states
    // when vectorized across groups (verified: standalone key folds
    // right, grouped pipeline returns garbage), and the q349
    // packed-grain discipline sidesteps the whole class. Applied two
    // ways: a fold in arrival order keeping max-packed state, and the
    // direct per-key max(packed). Equality per key (certified zero
    // mismatches) proves the resolution commutes — the certificate
    // that lets CDC consumers apply out-of-order batches without
    // resequencing. Per-key arrays basket-bounded; one shuffle.
    "q389_cdc_commutativity" -> ((s, dir) => {
      // spread (guide §2.5): the single-row-group lineitem scan is one
      // task, and the per-row md5 arrival hash + partial collect_list
      // otherwise serialize inside it; project the three needed columns
      // BEFORE the exchange (§2.3) so the spread moves narrow rows
      val log = graft.ops.Relational.spread(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")))
        .select(
        col("l_orderkey").as("k"),
        col("l_linenumber").cast(LongType).as("ver"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("payload"),
        expr("cast(conv(substring(md5(concat(cast(l_orderkey as string), ':', cast(l_linenumber as string))), 1, 6), 16, 10) as bigint)")
          .as("arrival"))
      // fold in ARRIVAL order over packed scalars: a record wins only if
      // its packed (ver·2³⁴ + payload) exceeds the state's.
      // Optimization r15 (guide §2.4 "remove shuffles outright"): the
      // fold arm and the direct max(packed) arm GROUP BY THE SAME KEY,
      // so both land in one aggregation — the old two-branch shape
      // scanned lineitem twice (each single-row-group scan one task,
      // re-hashing md5 arrival per row), shuffled it twice and paid a
      // sort-merge join on k to reunite values that never left the same
      // group. Per-key values and the final certificate are
      // bit-identical (oracle re-gated).
      val folded = log.groupBy("k")
        .agg(expr(
          "aggregate(transform(array_sort(collect_list(struct(arrival, ver, payload)))," +
            " e -> e.ver * 17179869184L + e.payload), -1L," +
            " (acc, x) -> case when x > acc then x else acc end)").as("st"),
          max(expr("ver * 17179869184L + payload")).as("m"))
        .select(col("k"), expr("st div 17179869184L").as("fold_ver"),
          expr("st % 17179869184L").as("fold_payload"),
          expr("m div 17179869184L").as("dir_ver"),
          expr("m % 17179869184L").as("dir_payload"))
      folded
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("fold_ver") =!= col("dir_ver") ||
            col("fold_payload") =!= col("dir_payload"), 1L).otherwise(0L)).as("n_mismatch"),
          sum("fold_payload").as("sum_payload"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', cast(fold_ver as string), ':', cast(fold_payload as string))))")
            .as("xor60_state"))
    }),

    // ── G335: Oaxaca-style rate decomposition (mix vs rate shift) ──────
    // Corpus return rate across the last two data-anchored months,
    // segmented by nation: Δrate = Σ (Δweight)·r₀ [mix shift]
    // + Σ w₀·(Δrate_s) [true rate shift] + Σ Δw·Δr [cross]. Weights
    // and rates are e6-floored rationals (documented); the residual
    // delta − (mix + rate + cross) is emitted and bounded by the
    // segment count — a decomposition that hides its rounding is not
    // an audit. Cell grain after one corpus pass.
    "q390_rate_decomposition" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM").as("m")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("m"), col("c_nationkey").as("seg"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      val months = li.select("m").distinct().orderBy(col("m").desc).limit(2)
        .agg(min("m").as("m0"), max("m").as("m1"))
      val cells = li.join(broadcast(months), col("m") === col("m0") || col("m") === col("m1"))
        .groupBy("seg")
        .agg(sum(when(col("m") === col("m0"), 1L).otherwise(0L)).as("n0"),
          sum(when(col("m") === col("m0"), col("ret")).otherwise(0L)).as("x0"),
          sum(when(col("m") === col("m1"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("m") === col("m1"), col("ret")).otherwise(0L)).as("x1"))
        .filter(col("n0") > 0 && col("n1") > 0)
      val tot = cells.agg(sum("n0").as("tn0"), sum("n1").as("tn1"),
        sum("x0").as("tx0"), sum("x1").as("tx1"))
      val terms = cells.crossJoin(broadcast(tot))
        .withColumn("w0", expr("n0 * 1000000 div tn0"))
        .withColumn("w1", expr("n1 * 1000000 div tn1"))
        .withColumn("r0", expr("x0 * 1000000 div n0"))
        .withColumn("r1", expr("x1 * 1000000 div n1"))
        .withColumn("mix", expr("(w1 - w0) * r0 div 1000000"))
        .withColumn("rate", expr("w0 * (r1 - r0) div 1000000"))
        .withColumn("crossx", expr("(w1 - w0) * (r1 - r0) div 1000000"))
      terms.agg(count(lit(1)).as("n_segments"),
          max(expr("tx1 * 1000000 div tn1 - tx0 * 1000000 div tn0")).as("delta_e6"),
          sum("mix").as("mix_e6"), sum("rate").as("rate_e6"),
          sum("crossx").as("cross_e6"))
        .withColumn("residual_e6", expr(
          "delta_e6 - (mix_e6 + rate_e6 + cross_e6)"))
    }),

    // ── G336: cooldown alert suppression (greedy emission fold) ────────
    // Error events per user under a 1-hour cooldown: an alert emits
    // only if ≥ 1 h has passed since the last EMITTED alert — which is
    // a greedy fold, NOT a lag filter (lag compares to the previous
    // RAW alert: a chain t₀, t₀+30 m, t₀+70 m would wrongly silence
    // the third, which is > 1 h past the last emission t₀). State
    // [last_emitted_us, n_emitted] folds over each user's sorted alert
    // times (activity-bounded arrays); census + per-user xor.
    "q391_cooldown_suppression" -> ((s, dir) => {
      val al = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
      val folded = al.groupBy("u")
        .agg(count(lit(1)).as("n_alerts"),
          expr("aggregate(transform(array_sort(collect_list(struct(us, eid))), e -> array(e.us))," +
            " array(0L, 0L)," +
            " (acc, x) -> case when x[0] - acc[0] > 3600000000 then array(x[0], acc[1] + 1) else acc end)")
            .as("st"))
        .select(col("u"), col("n_alerts"), expr("st[1]").as("n_emitted"))
      folded.agg(count(lit(1)).as("n_users"),
          sum("n_alerts").as("total_alerts"),
          sum("n_emitted").as("total_emitted"),
          expr("sum(n_alerts - n_emitted) * 10000 div greatest(sum(n_alerts), 1)")
            .as("suppressed_e4"),
          expr("bit_xor(md5_60(concat(cast(u as string), ':', cast(n_emitted as string))))")
            .as("xor60_emitted"))
    }),

    // ── G337: greedy set cover (10-round part selection) ───────────────
    // Pick ≤ 10 parts maximizing customer coverage, greedily: each
    // round takes the part with the most UNCOVERED customers (ties →
    // lowest partkey). The classic (1 − 1/e) approximation — the
    // campaign/assortment selection primitive. Driver loop with ONE
    // 1-row argmax collect per round (documented control-flow scalar,
    // the CC-loop precedent); per-round work is an anti-join at
    // (part, customer) grain. Output: the coverage curve round by
    // round. The DuckDB oracle unrolls the same 10 stages as chained
    // CTEs — the greedy choice is re-derived, not leaked.
    "q392_greedy_cover" -> ((s, dir) => {
      import s.implicits._
      val pc = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("p"), col("o_custkey").as("c"))
        .distinct()
        .localCheckpoint(true)
      // Optimization round 14: a batched-counts restructure (accumulate
      // duplicate-tolerant snapshots, re-derive the 10 cumulative
      // distinct counts in one final pass) measured SLOWER (8.0 s vs
      // 7.2 s) — the deferred countDistinct branches cost more than the
      // per-round count() jobs on checkpointed data they replaced, so
      // the original per-round shape is kept deliberately. The floor
      // here is ~30 sequential small jobs: greedy set cover is
      // inherently round-sequential (each argmax depends on the last).
      val nCust = pc.select("c").distinct().count()
      var covered = s.emptyDataset[Long].toDF("c")
      var rows = List.empty[(Long, Long, Long, Long)]
      var done = false
      var round = 1
      while (round <= 10 && !done) {
        val gains = pc.join(covered, Seq("c"), "left_anti")
          .groupBy("p").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("p").asc).limit(1)
          .collect()
        if (gains.isEmpty) done = true
        else {
          val (bestP, gain) = (gains(0).getLong(0), gains(0).getLong(1))
          covered = covered
            .unionByName(pc.filter(col("p") === bestP).select("c"))
            .distinct()
            .localCheckpoint(true)
          val cum = covered.count()
          rows ::= ((round.toLong, bestP, gain, cum))
          round += 1
        }
      }
      rows.reverse.toDF("round", "part", "gain", "cum_covered")
        .withColumn("coverage_e4", expr(s"cum_covered * 10000 div $nCust"))
        .orderBy("round")
    })
  )

  def oracleSql: Map[String, String] = Map(

    // Oracle note: the fold arm uses list_aggregate(…,'max') over the
    // arrival-sorted packed list — the fold's mathematical result —
    // because DuckDB 1.0's list_reduce corrupts state ACROSS rows in
    // vectorized batches (verified: a key's grouped fold returned a
    // neighbor key's max). The engine runs the real arrival-order fold;
    // an engine-fold bug still mismatches via n_mismatch/xor60_state.
    "q389_cdc_commutativity" ->
      """WITH log AS (SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS ver,
        |               CAST(round(l_extendedprice * 100) AS BIGINT) AS payload,
        |               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |                 CAST(l_linenumber AS VARCHAR)), 1, 6) AS BIGINT) AS arrival
        |             FROM lineitem),
        |folded AS (SELECT k,
        |    list_aggregate(list(ver * 17179869184 + payload
        |      ORDER BY arrival, ver, payload), 'max') AS st
        |  FROM log GROUP BY k),
        |f2 AS (SELECT k, st // 17179869184 AS fold_ver,
        |         st % 17179869184 AS fold_payload FROM folded),
        |direct AS (SELECT k, MAX(ver * 17179869184 + payload) AS m FROM log GROUP BY k),
        |d2 AS (SELECT k, m // 17179869184 AS dir_ver, m % 17179869184 AS dir_payload FROM direct)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(CASE WHEN fold_ver != dir_ver OR fold_payload != dir_payload
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |       CAST(SUM(fold_payload) AS BIGINT) AS sum_payload,
        |       bit_xor(CAST('0x' || substr(md5(CAST(f2.k AS VARCHAR) || ':' ||
        |         CAST(fold_ver AS VARCHAR) || ':' || CAST(fold_payload AS VARCHAR)), 1, 15) AS BIGINT))
        |         AS xor60_state
        |FROM f2 JOIN d2 ON f2.k = d2.k""".stripMargin,

    "q390_rate_decomposition" ->
      """WITH li AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
        |              c_nationkey AS seg,
        |              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        |            FROM lineitem
        |              JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey),
        |mm AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM
        |         (SELECT DISTINCT m FROM li ORDER BY m DESC LIMIT 2) z),
        |cells AS (SELECT seg,
        |            SUM(CASE WHEN m = m0 THEN 1 ELSE 0 END) AS n0,
        |            SUM(CASE WHEN m = m0 THEN ret ELSE 0 END) AS x0,
        |            SUM(CASE WHEN m = m1 THEN 1 ELSE 0 END) AS n1,
        |            SUM(CASE WHEN m = m1 THEN ret ELSE 0 END) AS x1
        |          FROM li, mm WHERE m = m0 OR m = m1 GROUP BY seg
        |          HAVING SUM(CASE WHEN m = m0 THEN 1 ELSE 0 END) > 0
        |             AND SUM(CASE WHEN m = m1 THEN 1 ELSE 0 END) > 0),
        |tot AS (SELECT SUM(n0) AS tn0, SUM(n1) AS tn1,
        |          SUM(x0) AS tx0, SUM(x1) AS tx1 FROM cells),
        |terms AS (SELECT seg,
        |            n0 * 1000000 // tn0 AS w0, n1 * 1000000 // tn1 AS w1,
        |            x0 * 1000000 // n0 AS r0, x1 * 1000000 // n1 AS r1,
        |            tx0, tx1, tn0, tn1
        |          FROM cells, tot)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(MAX(tx1 * 1000000 // tn1 - tx0 * 1000000 // tn0) AS BIGINT) AS delta_e6,
        |       CAST(SUM((w1 - w0) * r0 // 1000000) AS BIGINT) AS mix_e6,
        |       CAST(SUM(w0 * (r1 - r0) // 1000000) AS BIGINT) AS rate_e6,
        |       CAST(SUM((w1 - w0) * (r1 - r0) // 1000000) AS BIGINT) AS cross_e6,
        |       CAST(MAX(tx1 * 1000000 // tn1 - tx0 * 1000000 // tn0)
        |         - (SUM((w1 - w0) * r0 // 1000000) + SUM(w0 * (r1 - r0) // 1000000)
        |            + SUM((w1 - w0) * (r1 - r0) // 1000000)) AS BIGINT) AS residual_e6
        |FROM terms""".stripMargin,

    "q391_cooldown_suppression" ->
      """WITH al AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid
        |            FROM events WHERE event_type = 'error'),
        |folded AS (SELECT u, COUNT(*) AS n_alerts,
        |    list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
        |      list([us] ORDER BY us, eid)),
        |      (acc, x) -> CASE WHEN x[1] - acc[1] > 3600000000
        |                       THEN [x[1], acc[2] + 1] ELSE acc END) AS st
        |  FROM al GROUP BY u),
        |f2 AS (SELECT u, n_alerts, st[2] AS n_emitted FROM folded)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(n_alerts) AS BIGINT) AS total_alerts,
        |       CAST(SUM(n_emitted) AS BIGINT) AS total_emitted,
        |       CAST(SUM(n_alerts - n_emitted) * 10000
        |         // GREATEST(SUM(n_alerts), 1) AS BIGINT) AS suppressed_e4,
        |       bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |         CAST(n_emitted AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_emitted
        |FROM f2""".stripMargin,

    "q392_greedy_cover" -> {
      // unroll the 10 greedy rounds as chained CTEs; stage k re-derives
      // the same argmax (gain desc, part asc) the engine's loop takes.
      // Every CTE is MATERIALIZED: the chain references each prior stage
      // twice, so DuckDB's default inlining expands the pc scan
      // exponentially (~2¹⁰ parquet opens — measured as an fd-exhaustion
      // crash at sf0.01) while the materialized form evaluates each
      // stage exactly once, matching the engine loop's cost shape.
      val stages = new StringBuilder
      stages.append(
        """WITH pc AS MATERIALIZED (SELECT DISTINCT l_partkey AS p, o_custkey AS c
          |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |nc AS MATERIALIZED (SELECT COUNT(DISTINCT c) AS n FROM pc),
          |b1 AS MATERIALIZED (SELECT p, COUNT(*) AS gain FROM pc GROUP BY p
          |       ORDER BY gain DESC, p LIMIT 1),
          |s1 AS MATERIALIZED (SELECT p FROM b1),
          |c1 AS MATERIALIZED (SELECT DISTINCT c FROM pc WHERE p IN (SELECT p FROM s1))""".stripMargin)
      for (k <- 2 to 10) {
        val prevS = s"s${k - 1}"; val prevC = s"c${k - 1}"
        stages.append(s""",
          |b$k AS MATERIALIZED (SELECT p, COUNT(*) AS gain FROM pc
          |        WHERE c NOT IN (SELECT c FROM $prevC)
          |          AND p NOT IN (SELECT p FROM $prevS)
          |        GROUP BY p ORDER BY gain DESC, p LIMIT 1),
          |s$k AS MATERIALIZED (SELECT p FROM $prevS UNION SELECT p FROM b$k),
          |c$k AS MATERIALIZED (SELECT DISTINCT c FROM pc WHERE p IN (SELECT p FROM s$k))""".stripMargin)
      }
      val selects = (1 to 10).map { k =>
        s"""SELECT $k AS round, CAST(p AS BIGINT) AS part, CAST(gain AS BIGINT) AS gain,
           |  CAST((SELECT COUNT(*) FROM c$k) AS BIGINT) AS cum_covered,
           |  CAST((SELECT COUNT(*) FROM c$k) * 10000 // (SELECT n FROM nc) AS BIGINT) AS coverage_e4
           |FROM b$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      stages.toString + "\n" + selects + "\nORDER BY round"
    }
  )
}
