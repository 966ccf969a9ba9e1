package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential-decision wave (round 10, eightieth wave): Smith–Waterman
  * local alignment, the power of two choices, and the secretary
  * stopping rule.
  *
  * q474 completes q473: global Needleman–Wunsch alignment of a 6-step
  * pattern against ~70-event streams is gap-dominated (every score
  * negative at sf0.01 — the signal drowns in end-to-end gap penalty),
  * which is exactly why Smith & Waterman (1981) localized it. H[i][j]
  * = max(0, diag+s, up−1, left−1) clamps the DP at zero so the best
  * LOCAL segment match surfaces regardless of stream length; the fold
  * carries (row, best-so-far) and emits the score histogram. Bounds
  * 0 ≤ best ≤ 2·min(n,m) are certified per user, and the spec replays
  * the full DP in the driver bit-equal. q475 measures Azar et al.'s
  * (1994) power of two choices on real keys: within each of 512 hash
  * shards (the shard fold is sequential; shards are the parallel
  * unit, exactly how a scale-out placement service shards its
  * balancer state — and the shard count is sized so the sequential
  * grain stays SHORT: ~300 items/shard at sf0.1, which keeps the
  * DuckDB oracle's recursive replay at ~300 levels instead of the
  * ~4,700 that made the r10 gate take half an hour on this query
  * alone), items arrive in an independent hash order and
  * go to h1 (one-choice) vs the lesser-loaded of {h1, h2}
  * (two-choice greedy). Loads are conserved by construction and the
  * fold certifies it; the famous Θ(log n/log log n) → Θ(log log n)
  * max-load collapse is MEASURED, not cited. q476 replays the
  * secretary rule (reject the first ⌊n/e⌋, then take the first
  * record-beater) over every customer's order stream in date order:
  * success = the picked order IS the customer's maximum, measured
  * per stream length beside the 1/e asymptote. All three oracles
  * replay the identical folds as recursive CTEs.
  */
object SequentialQueries {

  private val Pattern = Seq("signup", "view", "click", "view", "click", "purchase")
  private val Bins = 32 // bins per shard (q475)
  private val Shards = 512 // sized so per-shard fold depth ≈ |orders|/512

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G419: Smith–Waterman local alignment score histogram ───────────
    "q474_sw_alignment" -> ((s, dir) => {
      val pat = Pattern.map(p => s"'$p'").mkString(", ")
      val m = Pattern.length
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("et"))
      // cell = max(0, diag + s, up − 1, left − 1); inner fold carries
      // (arr, running best); aggregate's finish lambda reshapes to the
      // outer (row, best) state without re-running the fold
      val cell = s"greatest(0L, element_at(acc.row, j + 1) - 1L, " +
        s"element_at(ir.arr, j) - 1L, element_at(acc.row, j) + " +
        s"(case when z.et = element_at(array($pat), j) then 2L else -1L end))"
      // spreadCompute: the O(events·m) SW fold below sits on a byte-tiny
      // collected frame AQE coalesces to one task; pin CPU-sized
      // partitioning so users fold in parallel
      val perUser = graft.ops.Relational.spreadCompute(
        ev.groupBy("u")
          .agg(expr("array_sort(collect_list(struct(us, eid, et)))").as("xs"),
            count(lit(1)).as("n_u")))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('row', transform(sequence(0, $m), j -> 0L),
             |    'best', 0L),
             |  (acc, z) -> aggregate(sequence(1, $m),
             |    named_struct('arr', array(0L), 'b', acc.best),
             |    (ir, j) -> named_struct(
             |      'arr', concat(ir.arr, array($cell)),
             |      'b', greatest(ir.b, $cell)),
             |    q -> named_struct('row', q.arr, 'best', q.b)))""".stripMargin))
        .select(col("u"), col("n_u"), expr("st.best").as("best"),
          expr(s"case when st.best < 0L or st.best > " +
            s"2 * least(n_u, cast($m as bigint)) then 1L else 0L end")
            .as("oob"),
          expr("md5_60(concat(cast(u as string), ':', cast(st.best as string)))")
            .as("rc"))
      perUser.groupBy("best")
        .agg(count(lit(1)).as("n_users"), sum("n_u").as("n_events"),
          sum("oob").as("n_oob"), expr("bit_xor(rc)").as("xor60_scores"))
        .orderBy("best")
    }),

    // ── G420: power of two choices, measured on real keys ──────────────
    "q475_two_choice" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr(s"pmod(md5_60(concat('shard:', cast(o_orderkey as string))), $Shards)")
            .as("shard"),
          expr("md5_60(concat('ord:', cast(o_orderkey as string)))").as("ord"),
          // element_at demands INT indexes inside the fold lambda
          expr(s"cast(pmod(md5_60(concat('c1:', cast(o_orderkey as string))), $Bins) as int)")
            .as("h1"),
          expr(s"cast(pmod(md5_60(concat('c2:', cast(o_orderkey as string))), $Bins) as int)")
            .as("h2"))
      // one-choice is placement-order-free: a plain groupBy
      val one = o.groupBy("shard", "h1").agg(count(lit(1)).as("load"))
        .agg(count(lit(1)).as("bins_hit"), sum("load").as("n_items"),
          max("load").as("max_load"), min("load").as("min_load_hit"))
        .select(lit("1_one_choice").as("scheme"), col("n_items"),
          col("max_load"),
          // bins a key never hashed to hold zero
          expr(s"case when bins_hit < $Bins * $Shards then 0L " +
            "else min_load_hit end").as("min_load"),
          lit(1L).as("conserve_ok"))
      // two-choice greedy IS placement-order-dependent: per-shard fold
      // in an independent hash arrival order, state = the 32 bin loads
      val chosen = "(case when element_at(acc, z.h2 + 1) < " +
        "element_at(acc, z.h1 + 1) then z.h2 + 1 else z.h1 + 1 end)"
      val two = o.groupBy("shard")
        .agg(expr("array_sort(collect_list(struct(ord, k, h1, h2)))").as("xs"),
          count(lit(1)).as("n_sh"))
        .withColumn("loads", expr(
          s"""aggregate(xs,
             |  transform(sequence(1, $Bins), p -> 0L),
             |  (acc, z) -> transform(sequence(1, $Bins),
             |    p -> element_at(acc, p) +
             |      (case when p = $chosen then 1L else 0L end)))""".stripMargin))
        .select(col("shard"), col("n_sh"),
          expr("aggregate(loads, 0L, (a, x) -> a + x)").as("placed"),
          expr("array_max(loads)").as("mx"), expr("array_min(loads)").as("mn"))
        .agg(sum("n_sh").as("n_items"), max("mx").as("max_load"),
          min("mn").as("min_load"),
          sum(expr("case when placed = n_sh then 0L else 1L end")).as("leaks"))
        .select(lit("2_two_choice").as("scheme"), col("n_items"),
          col("max_load"), col("min_load"),
          expr("case when leaks = 0L then 1L else 0L end").as("conserve_ok"))
      one.unionByName(two)
        .withColumn("spread", expr("max_load - min_load"))
        .select("scheme", "n_items", "max_load", "min_load", "spread",
          "conserve_ok")
        .orderBy("scheme")
    }),

    // ── G421: secretary stopping rule over order streams ───────────────
    "q476_secretary" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
          expr("cast(o_orderdate as date)").as("d"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      // r = ⌊n/e⌋ in exact integers (1/e at e6); fold: phase 1 learns
      // the record among the first r, phase 2 takes the first beater,
      // fallback the last item
      val perCust = o.groupBy("c")
        .agg(expr("array_sort(collect_list(struct(d, k, v)))").as("xs"),
          count(lit(1)).as("n"))
        .withColumn("r", expr("n * 367879 div 1000000"))
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('i', 0L, 'rejmax', -1L, 'pick', -1L, 'last', -1L),
            |  (acc, z) -> named_struct(
            |    'i', acc.i + 1L,
            |    'rejmax', case when acc.i + 1L <= r then greatest(acc.rejmax, z.v)
            |              else acc.rejmax end,
            |    'pick', case when acc.pick >= 0L then acc.pick
            |            when acc.i + 1L > r and z.v > acc.rejmax then z.v
            |            else -1L end,
            |    'last', z.v))""".stripMargin))
        .select(col("c"), col("n"), col("r"),
          expr("case when st.pick >= 0L then st.pick else st.last end")
            .as("picked"),
          expr("array_max(transform(xs, x -> x.v))").as("vmax"))
        .withColumn("success", expr(
          "case when picked = vmax then 1L else 0L end"))
      perCust.groupBy("n")
        .agg(count(lit(1)).as("n_customers"), sum("success").as("n_success"),
          max("r").as("r_max"), min("r").as("r_min"))
        .withColumn("success_e4", expr("n_success * 10000 div n_customers"))
        .withColumn("r_consistent", expr(
          "case when r_max = r_min then 1L else 0L end"))
        .select("n", "n_customers", "n_success", "success_e4", "r_max",
          "r_consistent")
        .orderBy("n")
    })
  )

  def oracleSql: Map[String, String] = {
    val m = Pattern.length
    // q474: the SW inner scan unrolled per pattern position, zero-clamped
    def swCell(j: Int): String =
      if (j == 0) "0"
      else s"GREATEST(0, r.row[${j + 1}] - 1, (${swCell(j - 1)}) - 1, " +
        s"r.row[$j] + (CASE WHEN s.et = '${Pattern(j - 1)}' THEN 2 ELSE -1 END))"
    val swRow = (0 to m).map(j => s"(${swCell(j)})").mkString(", ")
    val swBest = (1 to m).map(j => s"(${swCell(j)})").mkString(", ")
    Map(

    "q474_sw_alignment" ->
      s"""WITH RECURSIVE ev AS MATERIALIZED (SELECT user_id AS u, epoch_us(ts) AS us,
        |    event_id AS eid, event_type AS et FROM events),
        |seq AS MATERIALIZED (SELECT u, et,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY us, eid) AS i FROM ev),
        |nu AS MATERIALIZED (SELECT u, COUNT(*) AS n_u FROM ev GROUP BY u),
        |rec AS (
        |  SELECT u, 0::BIGINT AS i,
        |    list_transform(range(0, ${m + 1}), j -> 0)::BIGINT[] AS row,
        |    0::BIGINT AS best
        |  FROM nu
        |  UNION ALL
        |  SELECT s.u, s.i, [$swRow]::BIGINT[],
        |    GREATEST(r.best, $swBest)
        |  FROM rec r JOIN seq s ON s.u = r.u AND s.i = r.i + 1),
        |fin AS (SELECT r.u, nu.n_u, r.best FROM rec r
        |        JOIN nu ON r.u = nu.u WHERE r.i = nu.n_u)
        |SELECT CAST(best AS BIGINT) AS best,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_u) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN best < 0 OR best > 2 * LEAST(n_u, $m)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_oob,
        |  bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |    CAST(best AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_scores
        |FROM fin GROUP BY best ORDER BY best""".stripMargin,

    "q475_two_choice" ->
      s"""WITH RECURSIVE o AS MATERIALIZED (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5('shard:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % $Shards AS shard,
        |    CAST('0x' || substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS ord,
        |    CAST('0x' || substr(md5('c1:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % $Bins AS h1,
        |    CAST('0x' || substr(md5('c2:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % $Bins AS h2
        |  FROM orders),
        |one AS (SELECT COUNT(*) AS bins_hit, SUM(load) AS n_items,
        |    MAX(load) AS max_load, MIN(load) AS min_load_hit
        |  FROM (SELECT shard, h1, COUNT(*) AS load FROM o GROUP BY 1, 2)),
        |seq AS MATERIALIZED (SELECT shard, h1, h2,
        |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, k) AS i
        |  FROM o),
        |ns AS MATERIALIZED (SELECT shard, COUNT(*) AS n_sh FROM o GROUP BY shard),
        |rec AS (
        |  SELECT shard, 0::BIGINT AS i,
        |    list_transform(range(1, ${Bins + 1}), p -> 0)::BIGINT[] AS loads
        |  FROM ns
        |  UNION ALL
        |  SELECT s.shard, s.i,
        |    list_transform(range(1, ${Bins + 1}), p -> r.loads[p] +
        |      (CASE WHEN p = (CASE WHEN r.loads[s.h2 + 1] < r.loads[s.h1 + 1]
        |        THEN s.h2 + 1 ELSE s.h1 + 1 END) THEN 1 ELSE 0 END))::BIGINT[]
        |  FROM rec r JOIN seq s ON s.shard = r.shard AND s.i = r.i + 1),
        |two AS (SELECT SUM(ns.n_sh) AS n_items,
        |    MAX(list_max(r.loads)) AS max_load,
        |    MIN(list_min(r.loads)) AS min_load,
        |    SUM(CASE WHEN list_sum(r.loads) = ns.n_sh THEN 0 ELSE 1 END)
        |      AS leaks
        |  FROM rec r JOIN ns ON r.shard = ns.shard WHERE r.i = ns.n_sh)
        |SELECT scheme, CAST(n_items AS BIGINT) AS n_items,
        |  CAST(max_load AS BIGINT) AS max_load,
        |  CAST(min_load AS BIGINT) AS min_load,
        |  CAST(max_load - min_load AS BIGINT) AS spread,
        |  CAST(conserve_ok AS BIGINT) AS conserve_ok
        |FROM (
        |  SELECT '1_one_choice' AS scheme, n_items, max_load,
        |    CASE WHEN bins_hit < ${Bins * Shards} THEN 0
        |         ELSE min_load_hit END AS min_load,
        |    1 AS conserve_ok
        |  FROM one
        |  UNION ALL
        |  SELECT '2_two_choice', n_items, max_load, min_load,
        |    CASE WHEN leaks = 0 THEN 1 ELSE 0 END
        |  FROM two)
        |ORDER BY scheme""".stripMargin,

    "q476_secretary" ->
      """WITH RECURSIVE o AS MATERIALIZED (SELECT o_custkey AS c, o_orderkey AS k,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |seq AS MATERIALIZED (SELECT c, v,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY d, k, v) AS i FROM o),
        |nc AS MATERIALIZED (SELECT c, COUNT(*) AS n, MAX(v) AS vmax,
        |    COUNT(*) * 367879 // 1000000 AS r
        |  FROM o GROUP BY c),
        |rec AS (
        |  SELECT c, 0::BIGINT AS i, -1::BIGINT AS rejmax, -1::BIGINT AS pick,
        |    -1::BIGINT AS lastv
        |  FROM nc
        |  UNION ALL
        |  SELECT s.c, s.i,
        |    CASE WHEN s.i <= nc.r THEN GREATEST(r.rejmax, s.v)
        |         ELSE r.rejmax END,
        |    CASE WHEN r.pick >= 0 THEN r.pick
        |         WHEN s.i > nc.r AND s.v > r.rejmax THEN s.v
        |         ELSE -1 END,
        |    s.v
        |  FROM rec r JOIN seq s ON s.c = r.c AND s.i = r.i + 1
        |  JOIN nc ON nc.c = r.c),
        |fin AS (SELECT r.c, nc.n, nc.r AS rr,
        |    CASE WHEN r.pick >= 0 THEN r.pick ELSE r.lastv END AS picked,
        |    nc.vmax
        |  FROM rec r JOIN nc ON r.c = nc.c WHERE r.i = nc.n)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN picked = vmax THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_success,
        |  CAST(SUM(CASE WHEN picked = vmax THEN 1 ELSE 0 END) * 10000
        |    // COUNT(*) AS BIGINT) AS success_e4,
        |  CAST(MAX(rr) AS BIGINT) AS r_max,
        |  CAST(CASE WHEN MAX(rr) = MIN(rr) THEN 1 ELSE 0 END AS BIGINT)
        |    AS r_consistent
        |FROM fin GROUP BY n ORDER BY n""".stripMargin
    )
  }
}
