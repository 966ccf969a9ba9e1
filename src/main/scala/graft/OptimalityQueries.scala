package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Optimality wave (round 10, sixty-ninth wave): Belady's optimal
  * cache vs LRU, and the Markov stationary distribution of the event
  * chain.
  *
  * Reference intent: the reference caches nothing (every forecast
  * request re-reads Postgres — services/forecast-service/app/main.py)
  * and models no user dynamics. q449 runs Belady's MIN (1966) — evict
  * the entry whose next use is farthest in the future — beside q444's
  * LRU on the SAME per-user streams, in one fold carrying both cache
  * states; the optimality theorem (no online policy beats MIN) is
  * certified per user, violations counted at zero. The future
  * knowledge MIN needs is a lead() window per (user, type) — offline
  * replay is exactly what a trace-driven cache-sizing study does.
  * q451 closes q115's first-order Markov loop: the transition matrix
  * becomes row-stochastic at e6, twenty exact power-iteration rounds
  * with per-round L1 renormalization yield the stationary
  * distribution, the fixed-point residual ‖πP − π‖₁ is emitted, and
  * π is set beside the EMPIRICAL type frequencies — the two differ
  * by construction (per-user chain boundaries), and the gap is data,
  * not error.
  */
object OptimalityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G394: Belady's MIN vs LRU, one fold, optimality counted ────────
    // Cached entries carry their genuine next-use index (updated on
    // every hit, so the invariant "nu = next use strictly after the
    // entry's last access" holds throughout); eviction takes the max
    // (nu, type) — deterministic because types are unique in-cache.
    // Never-used-again entries share a finite sentinel; capacity 3
    // matches q444 so the hit-rate gap is the price of not knowing
    // the future.
    "q449_belady_opt" -> ((s, dir) => {
      val wU = Window.partitionBy("u").orderBy("us", "eid")
      val wK = Window.partitionBy("u", "et").orderBy("i")
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("et"))
        .withColumn("i", row_number().over(wU).cast("long"))
        .withColumn("nu", coalesce(lead(col("i"), 1).over(wK),
          lit(9999999999L)))
      val lruHit = "array_contains(acc.ql, z.et)"
      val optHit = "exists(acc.qb, e -> e.et = z.et)"
      val mx = "array_max(transform(acc.qb, e -> named_struct('nu', e.nu, 'et', e.et)))"
      // spreadCompute: the per-user LRU/Belady cache simulation below
      // sits on a byte-tiny collected frame AQE coalesces to one task
      val perUser = graft.ops.Relational.spreadCompute(
        ev.groupBy("u")
          .agg(expr("array_sort(collect_list(struct(i, et, nu)))").as("xs"),
            count(lit(1)).as("n_u")))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('ql', cast(array() as array<string>),
             |    'qb', cast(array() as array<struct<et: string, nu: bigint>>),
             |    'hl', 0L, 'hb', 0L),
             |  (acc, z) -> named_struct(
             |    'ql', case when $lruHit
             |      then concat(array(z.et), filter(acc.ql, x -> x != z.et))
             |      else slice(concat(array(z.et), acc.ql), 1, 3) end,
             |    'qb', case when $optHit
             |      then transform(acc.qb, e -> case when e.et = z.et
             |        then named_struct('et', z.et, 'nu', z.nu) else e end)
             |      when size(acc.qb) < 3
             |      then concat(acc.qb, array(named_struct('et', z.et, 'nu', z.nu)))
             |      else concat(
             |        filter(acc.qb, e -> not (e.nu = $mx.nu and e.et = $mx.et)),
             |        array(named_struct('et', z.et, 'nu', z.nu))) end,
             |    'hl', acc.hl + (case when $lruHit then 1L else 0L end),
             |    'hb', acc.hb + (case when $optHit then 1L else 0L end)))"""
            .stripMargin))
        .select(col("u"), col("n_u"),
          expr("st.hl").as("hl"), expr("st.hb").as("hb"),
          expr("md5_60(concat(cast(u as string), ':', " +
            "concat_ws(',', array_sort(transform(st.qb, e -> e.et)))))").as("rc"))
      perUser.agg(
          sum("n_u").as("n"), count(lit(1)).as("n_users"),
          sum("hl").as("lru_hits"), sum("hb").as("opt_hits"),
          sum(expr("case when hb < hl then 1L else 0L end")).as("n_viol"),
          expr("bit_xor(rc)").as("xor60_opt_cache"))
        .select(col("n"), col("n_users"), col("lru_hits"), col("opt_hits"),
          expr("lru_hits * 10000 div n").as("lru_hit_e4"),
          expr("opt_hits * 10000 div n").as("opt_hit_e4"),
          expr("(opt_hits - lru_hits) * 10000 div n").as("gap_e4"),
          col("n_viol"), col("xor60_opt_cache"))
    }),

    // ── G395: stationary distribution of the event-type chain ──────────
    // Bigrams (consecutive events per user) → 5×5 transition counts →
    // row-stochastic at e6 (zero-out rows cannot occur: every type
    // follows every type at corpus scale, and the spec asserts it).
    // π₀ uniform; 20 rounds of π' = normalize₁(πP) with the division
    // mirrored in the oracle; residual ‖πP − π‖₁ and the distance to
    // the empirical marginal emitted. The entire iteration runs on
    // ONE row of nested arrays — |types|² grain, corpus-free after
    // the bigram aggregation.
    "q451_markov_stationary" -> ((s, dir) => {
      val wU = Window.partitionBy("u").orderBy("us", "eid")
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("et"))
      val big = ev.withColumn("nxt", lead(col("et"), 1).over(wU))
        .filter(col("nxt").isNotNull)
      val types = ev.select(col("et")).distinct()
        .agg(sort_array(collect_list(col("et"))).as("ts"))
      val cnt = big.groupBy("et", "nxt").agg(count(lit(1)).as("c"))
      val mat = cnt.crossJoin(broadcast(types))
        .select(expr("array_position(ts, et)").as("i"),
          expr("array_position(ts, nxt)").as("j"), col("c"))
      val rows = mat.groupBy("i")
        .agg(sum("c").as("ci"),
          sort_array(collect_list(expr("struct(j, c)"))).as("js"))
        // dense row at e6: position j holds c_ij*1e6 div c_i
        .withColumn("row", expr(
          """transform(sequence(1L, 5L), jj ->
            |  aggregate(js, 0L, (a, z) ->
            |    a + case when z.j = jj then z.c * 1000000 div ci else 0L end))"""
            .stripMargin))
      val pmat = rows.orderBy("i")
        .agg(collect_list(expr("struct(i, row)")).as("pr0"))
        .withColumn("p", expr("transform(array_sort(pr0), z -> z.row)"))
      val emp = ev.crossJoin(broadcast(types))
        .groupBy(expr("array_position(ts, et)").as("i"))
        .agg(count(lit(1)).as("c"))
      val empArr = emp.crossJoin(broadcast(emp.agg(sum("c").as("ct"))))
        .withColumn("e6", expr("c * 1000000 div ct"))
        .agg(sort_array(collect_list(expr("struct(i, e6)"))).as("es"))
        .withColumn("emp", expr("transform(es, z -> z.e6)"))
      val stepped = pmat.crossJoin(broadcast(empArr)).crossJoin(broadcast(types))
        .withColumn("pi", expr(
          """aggregate(sequence(1, 20),
            |  array_repeat(200000L, 5),
            |  (acc, it) -> transform(sequence(1L, 5L), jj ->
            |    aggregate(sequence(1L, 5L), 0L, (a, ii) ->
            |      a + element_at(acc, cast(ii as int))
            |        * element_at(element_at(p, cast(ii as int)), cast(jj as int))
            |        div 1000000)),
            |  fin -> transform(fin, x -> x * 1000000 div
            |    aggregate(fin, 0L, (a, y) -> a + y)))""".stripMargin))
        .withColumn("pip", expr(
          """transform(sequence(1L, 5L), jj ->
            |  aggregate(sequence(1L, 5L), 0L, (a, ii) ->
            |    a + element_at(pi, cast(ii as int))
            |      * element_at(element_at(p, cast(ii as int)), cast(jj as int))
            |      div 1000000))""".stripMargin))
        .withColumn("resid", expr(
          """aggregate(sequence(1L, 5L), 0L, (a, ii) ->
            |  a + abs(element_at(pip, cast(ii as int))
            |        - element_at(pi, cast(ii as int))))""".stripMargin))
      stepped.select(posexplode(col("ts")).as(Seq("pos", "et")),
          col("pi"), col("emp"), col("resid"))
        .select(col("et"),
          expr("element_at(pi, pos + 1)").as("pi_e6"),
          expr("element_at(emp, pos + 1)").as("empirical_e6"),
          expr("element_at(pi, pos + 1) - element_at(emp, pos + 1)")
            .as("diff_e6"),
          col("resid").as("residual_l1_e6"))
        .orderBy("et")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q449_belady_opt" ->
      """WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid, event_type AS et FROM events),
        |seq0 AS (SELECT u, us, eid, et,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |seq AS (SELECT u, i, et,
        |    COALESCE(LEAD(i) OVER (PARTITION BY u, et ORDER BY i),
        |      9999999999) AS nu
        |  FROM seq0),
        |nu_t AS (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, i, [et] AS ql,
        |    [struct_pack(et := et, nu := nu)] AS qb,
        |    0::BIGINT AS hl, 0::BIGINT AS hb
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.u, s.i,
        |    CASE WHEN list_contains(r.ql, s.et)
        |      THEN list_prepend(s.et, list_filter(r.ql, x -> x != s.et))
        |      ELSE (list_prepend(s.et, r.ql))[1:3] END,
        |    CASE WHEN len(list_filter(r.qb, e -> e.et = s.et)) > 0
        |      THEN list_transform(r.qb, e -> CASE WHEN e.et = s.et
        |        THEN struct_pack(et := s.et, nu := s.nu) ELSE e END)
        |      WHEN len(r.qb) < 3
        |      THEN list_append(r.qb, struct_pack(et := s.et, nu := s.nu))
        |      ELSE list_append(
        |        list_filter(r.qb, e -> NOT (
        |          e.nu = list_sort(list_transform(r.qb,
        |            x -> struct_pack(nu := x.nu, et := x.et)))[len(r.qb)].nu
        |          AND e.et = list_sort(list_transform(r.qb,
        |            x -> struct_pack(nu := x.nu, et := x.et)))[len(r.qb)].et)),
        |        struct_pack(et := s.et, nu := s.nu)) END,
        |    r.hl + CASE WHEN list_contains(r.ql, s.et) THEN 1 ELSE 0 END,
        |    r.hb + CASE WHEN len(list_filter(r.qb, e -> e.et = s.et)) > 0
        |           THEN 1 ELSE 0 END
        |  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1),
        |fin AS (SELECT r.u, r.hl, r.hb, r.qb, nu_t.n_u
        |        FROM rec r JOIN nu_t ON r.u = nu_t.u WHERE r.i = nu_t.n_u)
        |SELECT CAST(SUM(n_u) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(hl) AS BIGINT) AS lru_hits,
        |  CAST(SUM(hb) AS BIGINT) AS opt_hits,
        |  CAST(SUM(hl) * 10000 // SUM(n_u) AS BIGINT) AS lru_hit_e4,
        |  CAST(SUM(hb) * 10000 // SUM(n_u) AS BIGINT) AS opt_hit_e4,
        |  CAST((SUM(hb) - SUM(hl)) * 10000 // SUM(n_u) AS BIGINT) AS gap_e4,
        |  CAST(SUM(CASE WHEN hb < hl THEN 1 ELSE 0 END) AS BIGINT) AS n_viol,
        |  bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |    array_to_string(list_sort(list_transform(qb, e -> e.et)), ',')),
        |    1, 15) AS BIGINT)) AS xor60_opt_cache
        |FROM fin""".stripMargin,

    "q451_markov_stationary" ->
      """WITH RECURSIVE ev AS (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid, event_type AS et FROM events),
        |seq AS (SELECT u, et,
        |    LEAD(et) OVER (PARTITION BY u ORDER BY us, eid) AS nxt FROM ev),
        |ts AS (SELECT list_sort(list(DISTINCT et)) AS ts FROM ev),
        |cnt AS (SELECT list_position((SELECT ts FROM ts), et) AS i,
        |    list_position((SELECT ts FROM ts), nxt) AS j, COUNT(*) AS c
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |ci AS (SELECT i, SUM(c) AS ci FROM cnt GROUP BY i),
        |jrow AS (SELECT ci.i, ci.ci,
        |    list(struct_pack(j := cnt.j, c := cnt.c)) AS js
        |  FROM ci JOIN cnt ON cnt.i = ci.i GROUP BY ci.i, ci.ci),
        |prow AS (SELECT i,
        |    list_transform(range(1, 6), jj ->
        |      list_sum(list_transform(js, z ->
        |        CASE WHEN z.j = jj THEN z.c * 1000000 // ci ELSE 0 END)))
        |      AS rw
        |  FROM jrow),
        |pm AS (SELECT list_transform(list_sort(list(struct_pack(
        |    i := i, rw := rw))), z -> z.rw) AS p FROM prow),
        |emp AS (SELECT list_position((SELECT ts FROM ts), et) AS i,
        |    COUNT(*) AS c FROM ev GROUP BY 1),
        |ea AS (SELECT list_transform(list_sort(list(struct_pack(
        |    i := i, e6 := c * 1000000 // (SELECT SUM(c) FROM emp)))),
        |    z -> z.e6) AS emp FROM emp),
        |it AS (
        |  SELECT 0::BIGINT AS step, [200000,200000,200000,200000,200000]
        |    ::BIGINT[] AS pi
        |  UNION ALL
        |  SELECT step + 1, list_transform(range(1, 6), jj ->
        |      list_sum(list_transform(range(1, 6), ii ->
        |        it.pi[ii] * pm.p[ii][jj] // 1000000)))
        |  FROM it, pm WHERE step < 20),
        |rawpi AS (SELECT pi FROM it WHERE step = 20),
        |pin AS (SELECT list_transform(pi, x -> x * 1000000 //
        |    list_sum(pi)) AS pi FROM rawpi),
        |pip AS (SELECT list_transform(range(1, 6), jj ->
        |    list_sum(list_transform(range(1, 6), ii ->
        |      pin.pi[ii] * pm.p[ii][jj] // 1000000))) AS pip
        |  FROM pin, pm),
        |res AS (SELECT list_sum(list_transform(range(1, 6), ii ->
        |    ABS(pip.pip[ii] - pin.pi[ii]))) AS resid FROM pip, pin)
        |SELECT t.et,
        |  CAST((SELECT pi FROM pin)[t.pos] AS BIGINT) AS pi_e6,
        |  CAST((SELECT emp FROM ea)[t.pos] AS BIGINT) AS empirical_e6,
        |  CAST((SELECT pi FROM pin)[t.pos]
        |    - (SELECT emp FROM ea)[t.pos] AS BIGINT) AS diff_e6,
        |  CAST((SELECT resid FROM res) AS BIGINT) AS residual_l1_e6
        |FROM (SELECT UNNEST(ts) AS et, generate_subscripts(ts, 1) AS pos
        |      FROM ts) t
        |ORDER BY t.et""".stripMargin
  )
}
