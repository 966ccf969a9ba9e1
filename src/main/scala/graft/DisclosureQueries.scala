package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disclosure-control mechanisms and the algebra beneath them
  * (round 10, sixtieth wave): the k-anonymity generalization ladder
  * as a MECHANISM (q140 audited k; this one achieves it), the
  * cell-suppression differencing attack and its complementary fix,
  * optimal interval scheduling with a dominance certificate, and the
  * integer-division semantics matrix the whole suite's determinism
  * discipline stands on.
  *
  * Reference intent: the reference publishes per-store daily
  * aggregates to its dashboard with no disclosure control at all
  * (services/web-ui reads raw per-store rows). q413 generalizes each
  * (nation, month) cell up a fixed lattice — month→quarter→year,
  * nation→region→all — to the MINIMAL level reaching k ≥ 10. q415
  * demonstrates why naive suppression fails: a row with exactly one
  * suppressed cell is recovered exactly from its published margin
  * (the differencing attack), then certifies the complementary-
  * suppression fix leaves zero recoverable cells. q414 is
  * earliest-end interval scheduling — provably optimal by the
  * exchange argument — with the dominance certificate run as data:
  * the earliest-START heuristic never beats it on any customer.
  * q416 pins div/%/pmod on signed integers: Spark `div` and DuckDB
  * `//` both truncate toward zero, `%` follows the dividend, and the
  * Euclidean identity d = 7·(d div 7) + d%7 holds row-for-row (the
  * double→int trap does NOT transfer: DuckDB CAST(DOUBLE AS BIGINT)
  * rounds half-away while Spark truncates — the portable form is
  * trunc(), pinned here as documentation).
  */
object DisclosureQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G358: k-anonymity generalization ladder ────────────────────────
    // Quasi-id lattice, coarse to fine: L0 (nation, month), L1
    // (nation, quarter), L2 (nation, year), L3 (region, year),
    // L4 (year). Each L0 cell takes the MINIMAL level whose
    // generalized cell holds k ≥ 10 rows; level 5 = suppressed (the
    // whole year bucket is still thin). Five independent aggregates on
    // one pass's grain — the rollup lattice (q384) aimed at privacy.
    // Output: per level, cells and rows resolved there — the utility
    // curve a release policy reads.
    "q413_kanon_ladder" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey").as("g"), col("n_regionkey").as("reg"))
      val base = o.join(c, "o_custkey").join(broadcast(n), "g")
        .select(col("g"), col("reg"),
          expr("year(d) * 12 + month(d) - 1").as("m"),
          expr("year(d) * 4 + (month(d) - 1) div 3").as("q"),
          expr("year(d)").as("y"))
      val l0 = base.groupBy("g", "m").agg(count(lit(1)).as("n0"),
        max("reg").as("reg"), max("q").as("q"), max("y").as("y"))
      val l1 = base.groupBy("g", "q").agg(count(lit(1)).as("n1"))
      val l2 = base.groupBy("g", "y").agg(count(lit(1)).as("n2"))
      val l3 = base.groupBy("reg", "y").agg(count(lit(1)).as("n3"))
      val l4 = base.groupBy("y").agg(count(lit(1)).as("n4"))
      l0.join(broadcast(l1), Seq("g", "q"))
        .join(broadcast(l2), Seq("g", "y"))
        .join(broadcast(l3), Seq("reg", "y"))
        .join(broadcast(l4), Seq("y"))
        .withColumn("lvl", expr(
          """case when n0 >= 10 then 0L when n1 >= 10 then 1L
            |     when n2 >= 10 then 2L when n3 >= 10 then 3L
            |     when n4 >= 10 then 4L else 5L end""".stripMargin))
        .groupBy("lvl")
        .agg(count(lit(1)).as("n_cells"), sum("n0").as("n_rows"))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nt"))))
        .withColumn("rows_share_e4", expr("n_rows * 10000 div nt"))
        .select("lvl", "n_cells", "n_rows", "rows_share_e4")
        .orderBy("lvl")
    }),

    // ── G359: earliest-end interval scheduling + dominance cert ────────
    // Intervals: one per order — [orderdate, max lineitem shipdate]
    // as day indexes, end folded up to the start (the generator ships
    // before order dates; q373's well-formedness discipline). Per
    // customer, the earliest-END greedy (optimal by the exchange
    // argument) and the earliest-START heuristic both run as
    // aggregate-HOF folds over sorted arrays; the certificate —
    // ee ≥ es on EVERY customer — is emitted, not assumed. Chosen
    // sets xor-receipted. The oracle replays both folds in ONE
    // variant-tagged RECURSIVE CTE.
    "q414_interval_schedule" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("u"),
          to_date(col("o_orderdate")).as("od"))
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(max(to_date(col("l_shipdate"))).as("sd"))
      val d0t = o.agg(min("od").as("d0"))
      val iv = o.join(li, "ok").crossJoin(broadcast(d0t))
        .select(col("u"), col("ok"),
          datediff(col("od"), col("d0")).cast("long").as("st"),
          greatest(datediff(col("sd"), col("d0")).cast("long"),
            datediff(col("od"), col("d0")).cast("long")).as("e"))
      val keep = "(z.st > acc.le)"
      val foldEE =
        s"""aggregate(ee, named_struct('le', -1L, 'cnt', 0L, 'xr', 0L),
           |  (acc, z) -> named_struct(
           |    'le', case when $keep then z.e else acc.le end,
           |    'cnt', acc.cnt + (case when $keep then 1L else 0L end),
           |    'xr', case when $keep
           |          then acc.xr ^ md5_60(concat(cast(u as string), ':',
           |               cast(z.ok as string)))
           |          else acc.xr end))""".stripMargin
      val foldES =
        s"""aggregate(es, named_struct('le', -1L, 'cnt', 0L),
           |  (acc, z) -> named_struct(
           |    'le', case when $keep then z.e else acc.le end,
           |    'cnt', acc.cnt + (case when $keep then 1L else 0L end)))"""
          .stripMargin
      val perU = iv.groupBy("u")
        .agg(count(lit(1)).as("n_iv"),
          expr("array_sort(collect_list(struct(e, st, ok)))").as("ee0"),
          expr("array_sort(collect_list(struct(st, e, ok)))").as("es0"))
        .withColumn("ee", expr(
          "transform(ee0, x -> named_struct('st', x.st, 'e', x.e, 'ok', x.ok))"))
        .withColumn("es", expr(
          "transform(es0, x -> named_struct('st', x.st, 'e', x.e, 'ok', x.ok))"))
        .withColumn("see", expr(foldEE))
        .withColumn("ses", expr(foldES))
        .select(col("u"), col("n_iv"), expr("see.cnt").as("ee_cnt"),
          expr("see.xr").as("xr"), expr("ses.cnt").as("es_cnt"))
      perU.agg(count(lit(1)).as("n_customers"),
          sum("n_iv").as("n_intervals"),
          sum("ee_cnt").as("chosen_ee"), sum("es_cnt").as("chosen_es"),
          sum(when(col("ee_cnt") < col("es_cnt"), 1L).otherwise(0L))
            .as("n_ee_losses"),
          expr("bit_xor(xr)").as("xor60_ee"),
          max("ee_cnt").as("max_ee_per_cust"))
        .select("n_customers", "n_intervals", "chosen_ee", "chosen_es",
          "n_ee_losses", "xor60_ee", "max_ee_per_cust")
    }),

    // ── G360: differencing attack + complementary suppression ──────────
    // Release: per (nation, quarter) row, order counts by priority
    // (dense 5-cell spine; zero cells publish as 0) plus the row
    // total, with primary suppression of cells 0 < n < 5. The attack:
    // exactly-one-suppressed rows recover their cell as
    // total − Σ published — certified equal to truth. The fix:
    // complementary-suppress the smallest other nonzero cell (or the
    // row total when none exists), then re-run the attack — zero
    // recoverable, held as data.
    "q415_differencing_attack" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("p"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val rows = o.join(c, "o_custkey")
        .select(col("g"), expr("year(d) * 4 + (month(d) - 1) div 3").as("qt"),
          col("p"))
      val cellsRaw = rows.groupBy("g", "qt", "p").agg(count(lit(1)).as("cnt"))
      val spine = rows.select("g", "qt").distinct()
        .crossJoin(broadcast(rows.select("p").distinct()))
      val cells = spine.join(cellsRaw, Seq("g", "qt", "p"), "left")
        .select(col("g"), col("qt"), col("p"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("supp1",
          when(col("cnt") > 0 && col("cnt") < 5, 1L).otherwise(0L))
      val perRow = cells.groupBy("g", "qt").agg(
        count(lit(1)).as("n_cells"),
        sum("cnt").as("total"),
        sum("supp1").as("n_supp"),
        sum(expr("case when supp1 = 0 then cnt else 0 end")).as("pub_sum"),
        // the suppressed cell's true value, defined when n_supp = 1
        max(expr("case when supp1 = 1 then cnt else -1 end")).as("supp_val"),
        // smallest published nonzero cell (complementary candidate)
        min(expr("case when supp1 = 0 and cnt > 0 then cnt end")).as("min_pub"))
      val audited = perRow
        .withColumn("recoverable", when(col("n_supp") === 1, 1L).otherwise(0L))
        .withColumn("recovered_ok", when(
          col("n_supp") === 1 &&
            col("total") - col("pub_sum") === col("supp_val"), 1L).otherwise(0L))
        .withColumn("supp2", when(
          col("n_supp") === 1 && col("min_pub").isNotNull, 1L).otherwise(0L))
        .withColumn("total_supp", when(
          col("n_supp") === 1 && col("min_pub").isNull, 1L).otherwise(0L))
        // after the fix: rows with total suppressed are unreadable; the
        // rest have n_supp + supp2 suppressed cells — recoverable iff
        // that count is exactly 1
        .withColumn("recoverable_after", when(
          col("total_supp") === 0 && col("n_supp") + col("supp2") === 1, 1L)
          .otherwise(0L))
      audited.agg(
          count(lit(1)).as("n_rows"), sum("n_cells").as("n_cells"),
          sum("n_supp").as("n_supp_primary"),
          sum("recoverable").as("n_recoverable"),
          sum("recovered_ok").as("n_recovered_exact"),
          sum("supp2").as("n_supp_secondary"),
          sum("total_supp").as("n_total_suppressed"),
          sum("recoverable_after").as("n_recoverable_after"))
    }),

    // ── G361: signed integer-division semantics matrix ─────────────────
    // Deltas d = price_cents − global mean (floor) — a real signed
    // spread. Pinned row-for-row: d div 7 (truncation toward zero,
    // both engines), d % 7 (sign follows the dividend), pmod(d, 7)
    // (always 0..6; DuckDB mirrors as ((d%7)+7)%7), and the Euclidean
    // identity d = 7·(d div 7) + d%7 with violations COUNTED (must be
    // zero). The xor receipt covers every derived value on every row —
    // one semantic drift anywhere flips it.
    "q416_intdiv_semantics" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
      val mu = o.agg(expr("sum(c) div count(*)").as("mu"))
      val d = o.crossJoin(broadcast(mu))
        .select(col("k"), expr("c - mu").as("d"))
        .select(col("k"), col("d"),
          expr("d div 7").as("q7"), expr("d % 7").as("r7"),
          expr("pmod(d, 7)").as("pm7"),
          // Spark sign() returns DOUBLE — cast, or the xor concat
          // feeds "1.0" where DuckDB feeds "1"
          expr("cast(sign(d) as bigint)").as("sg"))
      d.agg(count(lit(1)).as("n"),
          sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_neg"),
          sum(when(expr("d != 7 * q7 + r7"), 1L).otherwise(0L))
            .as("identity_violations"),
          sum(when(expr("pm7 != ((r7 + 7) % 7)"), 1L).otherwise(0L))
            .as("pmod_violations"),
          min("r7").as("r7_min"), max("r7").as("r7_max"),
          min("pm7").as("pm7_min"), max("pm7").as("pm7_max"),
          expr("""bit_xor(md5_60(concat(cast(k as string), ':',
                 cast(d as string), ':', cast(q7 as string), ':',
                 cast(r7 as string), ':', cast(pm7 as string), ':',
                 cast(sg as string))))""").as("xor60_matrix"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q413_kanon_ladder" ->
      """WITH base AS (SELECT c.c_nationkey AS g, n.n_regionkey AS reg,
        |    year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS m,
        |    year(o.o_orderdate) * 4 + (month(o.o_orderdate) - 1) // 3 AS q,
        |    year(o.o_orderdate) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |l0 AS (SELECT g, m, COUNT(*) AS n0, MAX(reg) AS reg, MAX(q) AS q,
        |    MAX(y) AS y FROM base GROUP BY g, m),
        |l1 AS (SELECT g, q, COUNT(*) AS n1 FROM base GROUP BY g, q),
        |l2 AS (SELECT g, y, COUNT(*) AS n2 FROM base GROUP BY g, y),
        |l3 AS (SELECT reg, y, COUNT(*) AS n3 FROM base GROUP BY reg, y),
        |l4 AS (SELECT y, COUNT(*) AS n4 FROM base GROUP BY y),
        |lv AS (SELECT l0.n0,
        |    CASE WHEN n0 >= 10 THEN 0 WHEN n1 >= 10 THEN 1
        |         WHEN n2 >= 10 THEN 2 WHEN n3 >= 10 THEN 3
        |         WHEN n4 >= 10 THEN 4 ELSE 5 END AS lvl
        |  FROM l0 JOIN l1 ON l0.g = l1.g AND l0.q = l1.q
        |    JOIN l2 ON l0.g = l2.g AND l0.y = l2.y
        |    JOIN l3 ON l0.reg = l3.reg AND l0.y = l3.y
        |    JOIN l4 ON l0.y = l4.y),
        |nt AS (SELECT COUNT(*) AS nt FROM base)
        |SELECT CAST(lvl AS BIGINT) AS lvl,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(n0) AS BIGINT) AS n_rows,
        |  CAST(SUM(n0) * 10000 // MAX(nt.nt) AS BIGINT) AS rows_share_e4
        |FROM lv, nt GROUP BY lvl ORDER BY lvl""".stripMargin,

    "q414_interval_schedule" ->
      """WITH RECURSIVE o AS (SELECT o_orderkey AS ok, o_custkey AS u,
        |    CAST(o_orderdate AS DATE) AS od FROM orders),
        |li AS (SELECT l_orderkey AS ok, MAX(CAST(l_shipdate AS DATE)) AS sd
        |       FROM lineitem GROUP BY l_orderkey),
        |d0t AS (SELECT MIN(od) AS d0 FROM o),
        |iv AS (SELECT u, o.ok, date_diff('day', d0, od) AS st,
        |    GREATEST(date_diff('day', d0, sd), date_diff('day', d0, od)) AS e
        |  FROM o JOIN li ON o.ok = li.ok, d0t),
        |seq AS (
        |  SELECT u, 'ee' AS var, st, e, ok,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY e, st, ok) AS i FROM iv
        |  UNION ALL
        |  SELECT u, 'es' AS var, st, e, ok,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY st, e, ok) AS i FROM iv),
        |nu AS (SELECT u, COUNT(*) AS n_u FROM iv GROUP BY u),
        |rec AS (
        |  SELECT u, var, i, e AS le, 1::BIGINT AS cnt,
        |    CASE WHEN var = 'ee' THEN CAST('0x' || substr(md5(
        |      CAST(u AS VARCHAR) || ':' || CAST(ok AS VARCHAR)), 1, 15)
        |      AS BIGINT) ELSE 0 END AS xr
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.u, s.var, s.i,
        |    CASE WHEN s.st > r.le THEN s.e ELSE r.le END,
        |    r.cnt + CASE WHEN s.st > r.le THEN 1 ELSE 0 END,
        |    CASE WHEN s.st > r.le AND s.var = 'ee'
        |         THEN xor(r.xr, CAST('0x' || substr(md5(CAST(s.u AS VARCHAR)
        |           || ':' || CAST(s.ok AS VARCHAR)), 1, 15) AS BIGINT))
        |         ELSE r.xr END
        |  FROM rec r JOIN seq s ON s.u = r.u AND s.var = r.var
        |    AND s.i = r.i + 1),
        |fin AS (SELECT rec.u, rec.var, rec.cnt, rec.xr
        |        FROM rec JOIN nu ON rec.u = nu.u WHERE rec.i = nu.n_u),
        |piv AS (SELECT u,
        |    MAX(CASE WHEN var = 'ee' THEN cnt END) AS ee_cnt,
        |    MAX(CASE WHEN var = 'es' THEN cnt END) AS es_cnt,
        |    MAX(CASE WHEN var = 'ee' THEN xr END) AS xr
        |  FROM fin GROUP BY u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals,
        |  CAST(SUM(ee_cnt) AS BIGINT) AS chosen_ee,
        |  CAST(SUM(es_cnt) AS BIGINT) AS chosen_es,
        |  CAST(SUM(CASE WHEN ee_cnt < es_cnt THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ee_losses,
        |  bit_xor(xr) AS xor60_ee,
        |  CAST(MAX(ee_cnt) AS BIGINT) AS max_ee_per_cust
        |FROM piv""".stripMargin,

    "q415_differencing_attack" ->
      """WITH rows0 AS (SELECT c.c_nationkey AS g,
        |    year(o.o_orderdate) * 4 + (month(o.o_orderdate) - 1) // 3 AS qt,
        |    CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS p
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cr AS (SELECT g, qt, p, COUNT(*) AS cnt FROM rows0 GROUP BY g, qt, p),
        |spine AS (SELECT g, qt, p FROM
        |    (SELECT DISTINCT g, qt FROM rows0) a,
        |    (SELECT DISTINCT p FROM rows0) b),
        |cells AS (SELECT s.g, s.qt, s.p, COALESCE(cr.cnt, 0) AS cnt,
        |    CASE WHEN COALESCE(cr.cnt, 0) > 0 AND COALESCE(cr.cnt, 0) < 5
        |         THEN 1 ELSE 0 END AS supp1
        |  FROM spine s LEFT JOIN cr ON s.g = cr.g AND s.qt = cr.qt
        |    AND s.p = cr.p),
        |pr AS (SELECT g, qt, COUNT(*) AS n_cells, SUM(cnt) AS total,
        |    SUM(supp1) AS n_supp,
        |    SUM(CASE WHEN supp1 = 0 THEN cnt ELSE 0 END) AS pub_sum,
        |    MAX(CASE WHEN supp1 = 1 THEN cnt ELSE -1 END) AS supp_val,
        |    MIN(CASE WHEN supp1 = 0 AND cnt > 0 THEN cnt END) AS min_pub
        |  FROM cells GROUP BY g, qt),
        |aud AS (SELECT *,
        |    CASE WHEN n_supp = 1 THEN 1 ELSE 0 END AS recoverable,
        |    CASE WHEN n_supp = 1 AND total - pub_sum = supp_val
        |         THEN 1 ELSE 0 END AS recovered_ok,
        |    CASE WHEN n_supp = 1 AND min_pub IS NOT NULL
        |         THEN 1 ELSE 0 END AS supp2,
        |    CASE WHEN n_supp = 1 AND min_pub IS NULL
        |         THEN 1 ELSE 0 END AS total_supp
        |  FROM pr)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(n_cells) AS BIGINT) AS n_cells,
        |  CAST(SUM(n_supp) AS BIGINT) AS n_supp_primary,
        |  CAST(SUM(recoverable) AS BIGINT) AS n_recoverable,
        |  CAST(SUM(recovered_ok) AS BIGINT) AS n_recovered_exact,
        |  CAST(SUM(supp2) AS BIGINT) AS n_supp_secondary,
        |  CAST(SUM(total_supp) AS BIGINT) AS n_total_suppressed,
        |  CAST(SUM(CASE WHEN total_supp = 0 AND n_supp + supp2 = 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_recoverable_after
        |FROM aud""".stripMargin,

    "q416_intdiv_semantics" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |mu AS (SELECT SUM(c) // COUNT(*) AS mu FROM o),
        |d AS (SELECT k, c - mu AS d, (c - mu) // 7 AS q7, (c - mu) % 7 AS r7,
        |    (((c - mu) % 7) + 7) % 7 AS pm7,
        |    CAST(sign(c - mu) AS BIGINT) AS sg
        |  FROM o, mu)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |  CAST(SUM(CASE WHEN d != 7 * q7 + r7 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS identity_violations,
        |  CAST(SUM(CASE WHEN pm7 != ((r7 + 7) % 7) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS pmod_violations,
        |  CAST(MIN(r7) AS BIGINT) AS r7_min, CAST(MAX(r7) AS BIGINT) AS r7_max,
        |  CAST(MIN(pm7) AS BIGINT) AS pm7_min,
        |  CAST(MAX(pm7) AS BIGINT) AS pm7_max,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(d AS VARCHAR) || ':' || CAST(q7 AS VARCHAR) || ':' ||
        |    CAST(r7 AS VARCHAR) || ':' || CAST(pm7 AS VARCHAR) || ':' ||
        |    CAST(sg AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_matrix
        |FROM d""".stripMargin
  )
}
