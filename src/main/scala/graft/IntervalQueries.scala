package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interval-algebra and attribution subsystem (round 10, fiftieth
  * wave): the Allen interval-relation census, temporal co-purchase
  * affinity, Markov removal-effect attribution, and a bitmap-algebra
  * inclusion-exclusion audit.
  *
  * Reference intent: the reference joins time ranges ad hoc (its
  * Airflow DAG windows, its lookback filters) without ever naming
  * which of Allen's thirteen relations a predicate means — q373 pins
  * ALL of them against DuckDB the way q264 pinned the join types and
  * q341 the window builtins, because "overlaps" bugs are exactly
  * where interval joins silently diverge. q374 extends q198's
  * same-basket affinity to a 7-day temporal basket (the grain
  * recommender co-visitation actually uses). q375 completes the
  * attribution family (last-touch q100, position q153, Shapley q242)
  * with the Markov removal effect — what fraction of 2-hop conversion
  * probability dies when a channel is deleted from the chain. q376
  * certifies the bitmap-index algebra (|A∪B| = |A|+|B|−|A∩B|) at the
  * BIT level against set-level counts — the identity a bitmap OR/AND
  * implementation must not break.
  */
object IntervalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G318: Allen interval-relation census ───────────────────────────
    // Each order's activity interval [least(orderdate, min shipdate),
    // greatest(orderdate, max shipdate)] (the generator ships some
    // lineitems BEFORE the order date, so both ends fold in o_orderdate
    // to keep a1 <= a2 well-formed) vs its order-quarter's interval:
    // classify into the exact
    // Allen relation (13 mutually exclusive cases by <, =, > on the
    // four endpoints) and census. The relations partition ALL interval
    // pairs, so n_orders must reconcile exactly — the census IS the
    // correctness certificate for any interval-join predicate built
    // from these comparisons. One corpus join to lineitem grain, one
    // classify pass, |relations| rows out.
    "q373_allen_census" -> ((s, dir) => {
      val iv = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("k"), to_date(col("o_orderdate")).as("od"),
          to_date(col("l_shipdate")).as("sd"))
        .groupBy("k", "od")
        .agg(least(min(col("sd")), min(col("od"))).as("a1"),
          greatest(max(col("sd")), max(col("od"))).as("a2"))
        .withColumn("b1", expr("date_trunc('quarter', od)").cast(DateType))
        .withColumn("b2", expr("date_sub(add_months(date_trunc('quarter', od), 3), 1)").cast(DateType))
      iv.withColumn("rel", expr(
          """case
            |  when a2 < b1 then 'precedes'
            |  when a2 = b1 and a1 < b1 then 'meets'
            |  when a1 < b1 and a2 > b1 and a2 < b2 then 'overlaps'
            |  when a1 < b1 and a2 = b2 then 'finished_by'
            |  when a1 < b1 and a2 > b2 then 'contains'
            |  when a1 = b1 and a2 < b2 then 'starts'
            |  when a1 = b1 and a2 = b2 then 'equals'
            |  when a1 = b1 and a2 > b2 then 'started_by'
            |  when a1 > b1 and a2 < b2 then 'during'
            |  when a1 > b1 and a1 < b2 and a2 = b2 then 'finishes'
            |  when a1 > b1 and a1 < b2 and a2 > b2 then 'overlapped_by'
            |  when a1 = b2 and a2 > b2 then 'met_by'
            |  else 'preceded_by' end""".stripMargin))
        .groupBy("rel")
        .agg(count(lit(1)).as("n_orders"),
          min(expr("datediff(a2, a1)")).cast(LongType).as("min_len_days"),
          max(expr("datediff(a2, a1)")).cast(LongType).as("max_len_days"))
        .orderBy("rel")
    }),

    // ── G319: temporal co-purchase affinity (7-day basket) ─────────────
    // q198 counts parts in the SAME order; real co-visitation uses a
    // time window — parts the same customer bought within 7 days of
    // each other, across orders. Candidate pairs come from a
    // customer-bounded self-join on (custkey, |Δday| ≤ 7) at the
    // (customer, part, day) grain — per-customer work is bounded by
    // that customer's activity, never corpus². Top-20 by pair count
    // with integer lift e4 (pair share vs independence).
    "q374_temporal_basket" -> ((s, dir) => {
      val cpd = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"), col("dn"))
        .distinct()
        // localCheckpoint: read four times (customer census, per-part
        // supports, both self-join sides) — lazily the join+distinct ran
        // per consumer (guide §3.3)
        .localCheckpoint()
      val nCust = cpd.select("c").distinct().count()
      val pc = cpd.select("c", "p").distinct()
        .groupBy("p").agg(count(lit(1)).as("np"))
      val pairs = cpd.as("x").join(cpd.as("y"),
          col("x.c") === col("y.c") && col("x.p") < col("y.p") &&
            expr("abs(x.dn - y.dn) <= 7"))
        .select(col("x.c").as("c"), col("x.p").as("pa"), col("y.p").as("pb"))
        .distinct()
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      pairs
        .join(pc.select(col("p").as("pa"), col("np").as("na")), Seq("pa"))
        .join(pc.select(col("p").as("pb"), col("np").as("nb")), Seq("pb"))
        .withColumn("lift_e4", expr(s"n_both * $nCust * 10000 div (na * nb)"))
        .select("pa", "pb", "n_both", "na", "nb", "lift_e4")
        .orderBy(col("n_both").desc, col("pa").asc, col("pb").asc)
        .limit(20)
    }),

    // ── G320: Markov removal-effect attribution (2-hop exact) ──────────
    // First-order chain over event types, conversion = purchase:
    // P₂(conv) = Σ_c P(start=c)·[P(c→conv) + Σ_m P(c→m)·P(m→conv)]
    // with every probability an exact count ratio; each path term is
    // e12-floored once (documented — the sum of ≤ |types|² terms keeps
    // the floor error under |types|²·1e-12). Removal effect of channel
    // x = share of P₂ carried by paths that TOUCH x (start, mid, or
    // direct) — the Markov answer to "what if we turned x off",
    // completing last-touch (q100) / position (q153) / Shapley (q242).
    // All grain tables are |types|-sized after one corpus pass each.
    "q375_markov_removal" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), col("event_type").as("t"),
          unix_micros(col("ts")).as("us"), col("event_id").as("eid"))
      // session start = each user's first event (deterministic tiebreak)
      val starts = ev.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("u")
            .orderBy(col("us").asc, col("eid").asc)))
        .filter(col("rk") === 1)
        .groupBy(col("t").as("c")).agg(count(lit(1)).as("n_start"))
      val nUsers = ev.select("u").distinct().count()
      // transitions: consecutive events per user
      val seq = ev.withColumn("nt", lead(col("t"), 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("u")
            .orderBy(col("us").asc, col("eid").asc)))
        .filter(col("nt").isNotNull)
      val trans = seq.groupBy(col("t").as("src"), col("nt").as("dst"))
        .agg(count(lit(1)).as("n"))
      val outT = trans.groupBy("src").agg(sum("n").as("n_out"))
      val p = trans.join(outT, Seq("src"))
        .select(col("src"), col("dst"), col("n"), col("n_out"))
      // path terms (start c): direct c→purchase, and c→m→purchase
      val direct = starts.join(p.filter(col("dst") === "purchase"),
          col("c") === col("src"))
        .select(col("c"), lit("(direct)").as("mid"),
          expr(s"cast(n_start as decimal(38,0)) * n * 1000000000000 div (cast($nUsers as decimal(38,0)) * n_out)")
            .cast(LongType).as("term_e12"))
      val twoHop = starts.join(p.as("p1"), col("c") === col("p1.src"))
        .filter(col("p1.dst") =!= "purchase")
        .join(p.as("p2").filter(col("p2.dst") === "purchase"),
          col("p1.dst") === col("p2.src"))
        .select(col("c"), col("p1.dst").as("mid"),
          expr(s"cast(n_start as decimal(38,0)) * p1.n * p2.n * 1000000000000" +
            s" div (cast($nUsers as decimal(38,0)) * p1.n_out * p2.n_out)")
            .cast(LongType).as("term_e12"))
      val terms = direct.unionByName(twoHop)
      val total = terms.agg(sum("term_e12").as("p2_e12"))
      val channels = ev.select(col("t").as("ch")).distinct().filter(col("ch") =!= "purchase")
      channels.crossJoin(broadcast(total))
        .join(terms.withColumnRenamed("c", "tc"),
          col("ch") === col("tc") || col("ch") === col("mid"), "left")
        .groupBy("ch", "p2_e12")
        .agg(coalesce(sum("term_e12"), lit(0L)).as("touched_e12"))
        .withColumn("removal_e4", expr("touched_e12 * 10000 div greatest(p2_e12, 1)"))
        .select(col("ch"), col("p2_e12"), col("touched_e12"), col("removal_e4"))
        .orderBy("ch")
    }),

    // ── G321: bitmap-algebra inclusion-exclusion audit ─────────────────
    // Customers as positions in 60-bit words (custkey div 60, bit
    // custkey mod 60 — bit 63 stays clear, so neither engine's shift
    // semantics near the sign bit is ever exercised): build per-word bitmaps for predicates
    // A = "has an urgent-priority order" and B = "has an F-status
    // order", then certify at the BIT level that popcount(A OR B) =
    // popcount(A) + popcount(B) − popcount(A AND B) on EVERY word and
    // that the bitmap counts equal the set-level distinct counts —
    // the identity a bitmap index implementation must never break.
    // One corpus pass to word grain; word-grain algebra after.
    "q376_bitmap_algebra" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey").as("c"),
        (col("o_orderpriority") === "1-URGENT").as("ia"),
        (col("o_orderstatus") === "F").as("ib"))
      val words = o.groupBy(expr("c div 60").as("w"))
        .agg(
          expr("cast(bit_or(case when ia then shiftleft(1L, cast(c % 60 as int)) else 0L end) as bigint)").as("ba"),
          expr("cast(bit_or(case when ib then shiftleft(1L, cast(c % 60 as int)) else 0L end) as bigint)").as("bb"))
      val sets = o.agg(
        countDistinct(when(col("ia"), col("c"))).as("set_a"),
        countDistinct(when(col("ib"), col("c"))).as("set_b"),
        countDistinct(when(col("ia") || col("ib"), col("c"))).as("set_or"))
      words.agg(count(lit(1)).as("n_words"),
          sum(expr("bit_count(ba)")).as("pop_a"),
          sum(expr("bit_count(bb)")).as("pop_b"),
          sum(expr("bit_count(ba | bb)")).as("pop_or"),
          sum(expr("bit_count(ba & bb)")).as("pop_and"),
          sum(expr("case when bit_count(ba | bb) = bit_count(ba) + bit_count(bb) - bit_count(ba & bb) then 0 else 1 end"))
            .as("n_word_violations"))
        .crossJoin(broadcast(sets))
        .withColumn("incl_excl_gap", expr("pop_or - (pop_a + pop_b - pop_and)"))
        .withColumn("bitmap_matches_sets",
          col("pop_a") === col("set_a") && col("pop_b") === col("set_b") &&
            col("pop_or") === col("set_or"))
        .select("n_words", "pop_a", "pop_b", "pop_or", "pop_and",
          "n_word_violations", "incl_excl_gap", "bitmap_matches_sets")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q373_allen_census" ->
      """WITH iv AS (SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS od,
        |              LEAST(MIN(CAST(l_shipdate AS DATE)), CAST(o_orderdate AS DATE)) AS a1,
        |              GREATEST(MAX(CAST(l_shipdate AS DATE)), CAST(o_orderdate AS DATE)) AS a2
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |            GROUP BY 1, 2),
        |q AS (SELECT *, CAST(date_trunc('quarter', od) AS DATE) AS b1,
        |        CAST(date_trunc('quarter', od) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS b2
        |      FROM iv),
        |cls AS (SELECT *,
        |    CASE
        |      WHEN a2 < b1 THEN 'precedes'
        |      WHEN a2 = b1 AND a1 < b1 THEN 'meets'
        |      WHEN a1 < b1 AND a2 > b1 AND a2 < b2 THEN 'overlaps'
        |      WHEN a1 < b1 AND a2 = b2 THEN 'finished_by'
        |      WHEN a1 < b1 AND a2 > b2 THEN 'contains'
        |      WHEN a1 = b1 AND a2 < b2 THEN 'starts'
        |      WHEN a1 = b1 AND a2 = b2 THEN 'equals'
        |      WHEN a1 = b1 AND a2 > b2 THEN 'started_by'
        |      WHEN a1 > b1 AND a2 < b2 THEN 'during'
        |      WHEN a1 > b1 AND a1 < b2 AND a2 = b2 THEN 'finishes'
        |      WHEN a1 > b1 AND a1 < b2 AND a2 > b2 THEN 'overlapped_by'
        |      WHEN a1 = b2 AND a2 > b2 THEN 'met_by'
        |      ELSE 'preceded_by' END AS rel
        |  FROM q)
        |SELECT rel, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(MIN(a2 - a1) AS BIGINT) AS min_len_days,
        |       CAST(MAX(a2 - a1) AS BIGINT) AS max_len_days
        |FROM cls GROUP BY rel ORDER BY rel""".stripMargin,

    "q374_temporal_basket" ->
      """WITH cpd AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p,
        |               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS dn
        |             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nc AS (SELECT COUNT(DISTINCT c) AS n_cust FROM cpd),
        |pc AS (SELECT p, COUNT(*) AS np FROM (SELECT DISTINCT c, p FROM cpd) z GROUP BY p),
        |pr AS (SELECT DISTINCT x.c, x.p AS pa, y.p AS pb
        |       FROM cpd x JOIN cpd y
        |         ON x.c = y.c AND x.p < y.p AND ABS(x.dn - y.dn) <= 7),
        |cnt AS (SELECT pa, pb, COUNT(*) AS n_both FROM pr GROUP BY pa, pb)
        |SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
        |       CAST(n_both AS BIGINT) AS n_both,
        |       CAST(a.np AS BIGINT) AS na, CAST(b.np AS BIGINT) AS nb,
        |       CAST(n_both * n_cust * 10000 // (a.np * b.np) AS BIGINT) AS lift_e4
        |FROM cnt JOIN pc a ON pa = a.p JOIN pc b ON pb = b.p, nc
        |ORDER BY n_both DESC, pa, pb LIMIT 20""".stripMargin,

    "q375_markov_removal" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us, event_id AS eid
        |            FROM events),
        |st AS (SELECT t AS c, COUNT(*) AS n_start FROM
        |         (SELECT *, ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS rk FROM ev) z
        |       WHERE rk = 1 GROUP BY t),
        |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM ev),
        |sq AS (SELECT u, t, LEAD(t) OVER (PARTITION BY u ORDER BY us, eid) AS nt FROM ev),
        |tr AS (SELECT t AS src, nt AS dst, COUNT(*) AS n FROM sq WHERE nt IS NOT NULL GROUP BY 1, 2),
        |ot AS (SELECT src, SUM(n) AS n_out FROM tr GROUP BY src),
        |p AS (SELECT tr.src, tr.dst, tr.n, ot.n_out FROM tr JOIN ot USING (src)),
        |direct AS (SELECT c, '(direct)' AS mid,
        |             CAST(CAST(n_start AS HUGEINT) * n * 1000000000000
        |               // (CAST(n_users AS HUGEINT) * n_out) AS BIGINT) AS term_e12
        |           FROM st JOIN p ON c = src, nu WHERE dst = 'purchase'),
        |two AS (SELECT c, p1.dst AS mid,
        |          CAST(CAST(n_start AS HUGEINT) * p1.n * p2.n * 1000000000000
        |            // (CAST(n_users AS HUGEINT) * p1.n_out * p2.n_out) AS BIGINT) AS term_e12
        |        FROM st JOIN p p1 ON c = p1.src
        |          JOIN p p2 ON p1.dst = p2.src, nu
        |        WHERE p1.dst != 'purchase' AND p2.dst = 'purchase'),
        |terms AS (SELECT * FROM direct UNION ALL SELECT * FROM two),
        |tot AS (SELECT SUM(term_e12) AS p2_e12 FROM terms),
        |ch AS (SELECT DISTINCT t AS ch FROM ev WHERE t != 'purchase')
        |SELECT ch, CAST(p2_e12 AS BIGINT) AS p2_e12,
        |       CAST(COALESCE(SUM(term_e12), 0) AS BIGINT) AS touched_e12,
        |       CAST(COALESCE(SUM(term_e12), 0) * 10000 // GREATEST(p2_e12, 1) AS BIGINT) AS removal_e4
        |FROM ch CROSS JOIN tot
        |  LEFT JOIN terms ON ch = terms.c OR ch = terms.mid
        |GROUP BY ch, p2_e12 ORDER BY ch""".stripMargin,

    "q376_bitmap_algebra" ->
      """WITH o AS (SELECT o_custkey AS c,
        |             o_orderpriority = '1-URGENT' AS ia,
        |             o_orderstatus = 'F' AS ib
        |           FROM orders),
        |words AS (SELECT c // 60 AS w,
        |            bit_or(CASE WHEN ia THEN (CAST(1 AS BIGINT) << CAST(c % 60 AS INT)) ELSE 0 END) AS ba,
        |            bit_or(CASE WHEN ib THEN (CAST(1 AS BIGINT) << CAST(c % 60 AS INT)) ELSE 0 END) AS bb
        |          FROM o GROUP BY 1),
        |sets AS (SELECT COUNT(DISTINCT CASE WHEN ia THEN c END) AS set_a,
        |           COUNT(DISTINCT CASE WHEN ib THEN c END) AS set_b,
        |           COUNT(DISTINCT CASE WHEN ia OR ib THEN c END) AS set_or
        |         FROM o),
        |agg AS (SELECT COUNT(*) AS n_words,
        |          SUM(bit_count(ba)) AS pop_a, SUM(bit_count(bb)) AS pop_b,
        |          SUM(bit_count(ba | bb)) AS pop_or,
        |          SUM(bit_count(ba & bb)) AS pop_and,
        |          SUM(CASE WHEN bit_count(ba | bb) = bit_count(ba) + bit_count(bb) - bit_count(ba & bb)
        |                   THEN 0 ELSE 1 END) AS n_word_violations
        |        FROM words)
        |SELECT CAST(n_words AS BIGINT) AS n_words,
        |       CAST(pop_a AS BIGINT) AS pop_a, CAST(pop_b AS BIGINT) AS pop_b,
        |       CAST(pop_or AS BIGINT) AS pop_or, CAST(pop_and AS BIGINT) AS pop_and,
        |       CAST(n_word_violations AS BIGINT) AS n_word_violations,
        |       CAST(pop_or - (pop_a + pop_b - pop_and) AS BIGINT) AS incl_excl_gap,
        |       pop_a = set_a AND pop_b = set_b AND pop_or = set_or AS bitmap_matches_sets
        |FROM agg, sets""".stripMargin
  )
}
