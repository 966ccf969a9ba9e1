package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Convergence wave (round 10, eighty-sixth wave): ternary search on
  * a convex cost, AIMD fairness.
  *
  * q492 runs integer ternary search over the convex piecewise-linear
  * cost f(x) = Σ_days |x − vol_d| (the L1 location problem on the
  * daily-volume curve — calendar-bounded, so the fold input is a
  * ≤ |days| array). The search narrows [lo, hi] 40 rounds with the
  * plateau-safe rule (f(m1) ≤ f(m2) ⟹ hi = m2), then the final ≤ 3
  * candidates are scanned. Optimality is CERTIFIED twice over: the
  * winner is a convex local minimum (f(x*) ≤ both neighbors — for a
  * convex f that IS the global proof), and its cost equals f(median)
  * exactly — the L1-median theorem, observed. q493 replays Chiu &
  * Jain's (1989) AIMD convergence argument on real daily capacities:
  * two flows with different hash-drawn initial windows share the
  * day's order volume; both +1 on an under-capacity day, both halve
  * (floored at 1) on congestion. |w1 − w2| never increases — halving
  * is a slope-½ monotone map — counted at zero violations, with the
  * first-fairness day, loss/increase census, and exact utilization.
  */
object ConvergenceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G437: ternary search + the L1-median theorem ───────────────────
    "q492_ternary_median" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .groupBy(expr("cast(o_orderdate as date)").as("d"))
        .agg(count(lit(1)).as("vol"))
      // f(x) as an in-row scan over the volume array
      def f(x: String) =
        s"aggregate(vs, 0L, (a, v) -> a + abs($x - v))"
      val one = days.agg(expr("array_sort(collect_list(vol))").as("vs"),
          count(lit(1)).as("nd"), min("vol").as("lo0"), max("vol").as("hi0"))
        .withColumn("rng", expr(
          s"""aggregate(sequence(1, 40),
             |  named_struct('lo', lo0, 'hi', hi0),
             |  (acc, z) -> case when acc.hi - acc.lo <= 2L then acc
             |    else element_at(transform(
             |      array(named_struct(
             |        'm1', (2L * acc.lo + acc.hi) div 3L,
             |        'm2', (acc.lo + 2L * acc.hi + 2L) div 3L)),
             |      m -> case when ${f("m.m1")} <= ${f("m.m2")}
             |        then named_struct('lo', acc.lo, 'hi', m.m2)
             |        else named_struct('lo', m.m1, 'hi', acc.hi) end), 1)
             |    end)""".stripMargin))
        // final scan of the ≤ 3 surviving candidates
        .withColumn("xstar", expr(
          s"""element_at(array_sort(transform(
             |  sequence(cast(rng.lo as int), cast(rng.hi as int)),
             |  x -> named_struct('fx', ${f("x")}, 'x', cast(x as bigint)))),
             |  1).x""".stripMargin))
        .withColumn("fstar", expr(f("xstar")))
        .withColumn("med", expr(
          "element_at(vs, cast((nd + 1) div 2 as int))"))
      one.select(col("nd").as("n_days"), col("lo0"), col("hi0"),
          col("xstar"), col("fstar"), col("med"),
          expr(s"${f("med")}").as("f_median"),
          expr(s"case when fstar <= ${f("xstar - 1")} " +
            s"and fstar <= ${f("xstar + 1")} then 1L else 0L end")
            .as("local_min_ok"),
          expr(s"case when fstar = ${f("med")} then 1L else 0L end")
            .as("median_theorem_ok"))
    }),

    // ── G438: AIMD fairness convergence (Chiu–Jain) ────────────────────
    "q493_aimd_fairness" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .groupBy(expr("cast(o_orderdate as date)").as("d"))
        .agg(count(lit(1)).as("cap"))
      val w10 = "1L + pmod(md5_60('flow1'), 8L)"
      val w20 = "9L + pmod(md5_60('flow2'), 8L)"
      val one = days.agg(
          expr("array_sort(collect_list(struct(d, cap)))").as("xs"),
          count(lit(1)).as("nd"), sum("cap").as("cap_total"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('w1', $w10, 'w2', $w20,
             |    'nloss', 0L, 'ninc', 0L, 'used', 0L, 'viol', 0L,
             |    'firstfair', 0L, 'day', 0L),
             |  (acc, z) -> element_at(transform(array(
             |      case when acc.w1 + acc.w2 <= z.cap
             |        then named_struct('w1', acc.w1 + 1L, 'w2', acc.w2 + 1L,
             |          'loss', 0L)
             |        else named_struct('w1', greatest(acc.w1 div 2L, 1L),
             |          'w2', greatest(acc.w2 div 2L, 1L), 'loss', 1L) end),
             |    nw -> named_struct(
             |      'w1', nw.w1, 'w2', nw.w2,
             |      'nloss', acc.nloss + nw.loss,
             |      'ninc', acc.ninc + (1L - nw.loss),
             |      'used', acc.used + least(acc.w1 + acc.w2, z.cap),
             |      'viol', acc.viol + (case when abs(nw.w1 - nw.w2) >
             |        abs(acc.w1 - acc.w2) then 1L else 0L end),
             |      'firstfair', case when acc.firstfair > 0L then acc.firstfair
             |        when abs(nw.w1 - nw.w2) <= 1L then acc.day + 1L
             |        else 0L end,
             |      'day', acc.day + 1L)), 1))""".stripMargin))
      one.select(col("nd").as("n_days"), col("cap_total"),
          expr(s"$w10").as("w1_init"), expr(s"$w20").as("w2_init"),
          expr("st.w1").as("w1_final"), expr("st.w2").as("w2_final"),
          expr("st.nloss").as("n_loss_days"),
          expr("st.ninc").as("n_increase_days"),
          expr("st.viol").as("n_fairness_violations"),
          expr("st.firstfair").as("first_fair_day"),
          expr("st.used * 10000 div cap_total").as("utilization_e4"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q492_ternary_median" -> {
      def f(x: String) =
        s"list_sum(list_transform(vs, v -> abs(($x) - v)))"
      s"""WITH RECURSIVE days AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    COUNT(*) AS vol FROM orders GROUP BY 1),
        |arr AS (SELECT list_sort(list(vol)) AS vs, COUNT(*) AS nd,
        |    MIN(vol) AS lo0, MAX(vol) AS hi0 FROM days),
        |rec AS (
        |  SELECT 0::BIGINT AS i, lo0 AS lo, hi0 AS hi FROM arr
        |  UNION ALL
        |  SELECT z.i, CASE WHEN z.stay = 1 THEN z.lo
        |      WHEN z.down = 1 THEN z.lo ELSE z.m1 END,
        |    CASE WHEN z.stay = 1 THEN z.hi
        |      WHEN z.down = 1 THEN z.m2 ELSE z.hi END
        |  FROM (
        |    SELECT r.i + 1 AS i, r.lo, r.hi,
        |      (2 * r.lo + r.hi) // 3 AS m1,
        |      (r.lo + 2 * r.hi + 2) // 3 AS m2,
        |      CASE WHEN r.hi - r.lo <= 2 THEN 1 ELSE 0 END AS stay,
        |      CASE WHEN ${f("(2 * r.lo + r.hi) // 3")} <=
        |        ${f("(r.lo + 2 * r.hi + 2) // 3")} THEN 1 ELSE 0 END AS down
        |    FROM rec r, arr WHERE r.i < 40) z),
        |fin AS (SELECT lo, hi FROM rec WHERE i = 40),
        |cand AS (SELECT fin.lo + o.o AS x, ${f("fin.lo + o.o")} AS fx
        |  FROM fin, arr, (SELECT UNNEST(range(0, 3)) AS o) o
        |  WHERE fin.lo + o.o <= fin.hi),
        |best AS (SELECT x AS xstar, fx AS fstar FROM cand
        |         ORDER BY fx, x LIMIT 1)
        |SELECT CAST(nd AS BIGINT) AS n_days, CAST(lo0 AS BIGINT) AS lo0,
        |  CAST(hi0 AS BIGINT) AS hi0,
        |  CAST(xstar AS BIGINT) AS xstar, CAST(fstar AS BIGINT) AS fstar,
        |  CAST(vs[CAST((nd + 1) // 2 AS INT)] AS BIGINT) AS med,
        |  CAST(${f("vs[CAST((nd + 1) // 2 AS INT)]")} AS BIGINT) AS f_median,
        |  CAST(CASE WHEN fstar <= ${f("xstar - 1")}
        |    AND fstar <= ${f("xstar + 1")} THEN 1 ELSE 0 END AS BIGINT)
        |    AS local_min_ok,
        |  CAST(CASE WHEN fstar = ${f("vs[CAST((nd + 1) // 2 AS INT)]")}
        |    THEN 1 ELSE 0 END AS BIGINT) AS median_theorem_ok
        |FROM best, arr""".stripMargin
    },

    "q493_aimd_fairness" ->
      s"""WITH RECURSIVE days AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    COUNT(*) AS cap FROM orders GROUP BY 1),
        |seq AS (SELECT d, cap, ROW_NUMBER() OVER (ORDER BY d) AS i FROM days),
        |nd AS (SELECT COUNT(*) AS nd, SUM(cap) AS cap_total FROM days),
        |init AS (SELECT
        |    1 + CAST('0x' || substr(md5('flow1'), 1, 15) AS BIGINT) % 8 AS w10,
        |    9 + CAST('0x' || substr(md5('flow2'), 1, 15) AS BIGINT) % 8 AS w20),
        |rec AS (
        |  SELECT 0::BIGINT AS i, w10 AS w1, w20 AS w2, 0::BIGINT AS nloss,
        |    0::BIGINT AS ninc, 0::BIGINT AS used, 0::BIGINT AS viol,
        |    0::BIGINT AS firstfair
        |  FROM init
        |  UNION ALL
        |  SELECT z.i, z.nw1, z.nw2,
        |    z.nloss + z.loss, z.ninc + (1 - z.loss),
        |    z.used + LEAST(z.w1 + z.w2, z.cap),
        |    z.viol + (CASE WHEN ABS(z.nw1 - z.nw2) > ABS(z.w1 - z.w2)
        |      THEN 1 ELSE 0 END),
        |    CASE WHEN z.firstfair > 0 THEN z.firstfair
        |      WHEN ABS(z.nw1 - z.nw2) <= 1 THEN z.i ELSE 0 END
        |  FROM (
        |    SELECT s.i, s.cap, r.w1, r.w2, r.nloss, r.ninc, r.used, r.viol,
        |      r.firstfair,
        |      CASE WHEN r.w1 + r.w2 <= s.cap THEN r.w1 + 1
        |           ELSE GREATEST(r.w1 // 2, 1) END AS nw1,
        |      CASE WHEN r.w1 + r.w2 <= s.cap THEN r.w2 + 1
        |           ELSE GREATEST(r.w2 // 2, 1) END AS nw2,
        |      CASE WHEN r.w1 + r.w2 <= s.cap THEN 0 ELSE 1 END AS loss
        |    FROM rec r JOIN seq s ON s.i = r.i + 1) z),
        |fin AS (SELECT r.* FROM rec r, nd WHERE r.i = nd.nd)
        |SELECT CAST(nd.nd AS BIGINT) AS n_days,
        |  CAST(nd.cap_total AS BIGINT) AS cap_total,
        |  CAST(init.w10 AS BIGINT) AS w1_init,
        |  CAST(init.w20 AS BIGINT) AS w2_init,
        |  CAST(f.w1 AS BIGINT) AS w1_final, CAST(f.w2 AS BIGINT) AS w2_final,
        |  CAST(f.nloss AS BIGINT) AS n_loss_days,
        |  CAST(f.ninc AS BIGINT) AS n_increase_days,
        |  CAST(f.viol AS BIGINT) AS n_fairness_violations,
        |  CAST(f.firstfair AS BIGINT) AS first_fair_day,
        |  CAST(f.used * 10000 // nd.cap_total AS BIGINT) AS utilization_e4
        |FROM fin f, nd, init""".stripMargin
  )
}
