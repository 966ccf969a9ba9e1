package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** State-bridge and reconciliation subsystem (round 10, fifty-third
  * wave): snapshot-resume equivalence for a stateful fold, distributed
  * quantiles from per-shard summaries, late-arriving-dimension
  * reconciliation, and the price-volume-mix revenue bridge.
  *
  * Reference intent: the reference recomputes everything from scratch
  * on every DAG run (the services/airflow/dags DAG files) — no snapshots, no
  * shard summaries, no late-data story, and its revenue dashboards
  * show deltas with no decomposition. These four are the incremental-
  * systems layer: q385 certifies THE property that makes checkpointed
  * state trustworthy (fold(all) = fold(tail, seed = fold(head)) for
  * the capped-balance recurrence — true because the state is Markov,
  * certified per user); q386 is how a 1000-executor cluster answers
  * "global p99" without a global sort — per-shard exact ladders merged
  * by weighted rank, with the rank-error bound emitted and certified;
  * q387 is the unknown-bucket → backfill → reclassify ledger every
  * late dimension needs; q388 decomposes a month-over-month revenue
  * delta into price/volume/mix effects with the rounding residual
  * emitted explicitly (floors documented, residual bounded).
  */
object BridgeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G330: snapshot-resume equivalence (stateful fold checkpoint) ───
    // q227's capped balance bal ← max(bal + dx, 0) per user, computed
    // three ways: direct fold over the full history, and snapshot
    // (fold over events ≤ T, T = data-anchored 60% point) + resume
    // (fold over events > T seeded with the snapshot). Markov state ⇒
    // the two must agree EXACTLY per user — the certificate that lets
    // a 100-TB pipeline restart from checkpoints instead of replaying
    // history. Folds run over per-user sorted arrays (activity-bounded,
    // q284's discipline); identical fold arithmetic in list_reduce.
    "q385_snapshot_resume" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"),
          expr("cast(round(value * 1000000) as bigint) * " +
            "(case when event_type = 'purchase' then 1 else -1 end)").as("dx6"))
      val cut = ev.agg((min("us") + (max("us") - min("us")) * 6 / 10).as("t"))
      val arr = ev.crossJoin(broadcast(cut))
        .groupBy("u")
        .agg(
          expr("transform(array_sort(collect_list(struct(us, eid, dx6, us <= t as head))), e -> e.dx6)")
            .as("all_dx"),
          expr("transform(array_sort(filter(collect_list(struct(us, eid, dx6, us <= t as head)), e -> e.head)), e -> e.dx6)")
            .as("head_dx"),
          expr("transform(array_sort(filter(collect_list(struct(us, eid, dx6, us <= t as head)), e -> not e.head)), e -> e.dx6)")
            .as("tail_dx"))
      val folded = arr
        .withColumn("direct", expr(
          "aggregate(all_dx, 0L, (a, x) -> greatest(a + x, 0L))"))
        .withColumn("snap", expr(
          "aggregate(head_dx, 0L, (a, x) -> greatest(a + x, 0L))"))
        .withColumn("resumed", expr(
          "aggregate(tail_dx, snap, (a, x) -> greatest(a + x, 0L))"))
      folded.agg(count(lit(1)).as("n_users"),
          sum(when(col("direct") =!= col("resumed"), 1L).otherwise(0L)).as("n_mismatch"),
          sum("direct").as("total_balance6"),
          expr("bit_xor(md5_60(concat(cast(u as string), ':', cast(direct as string))))")
            .as("xor60_balances"))
    }),

    // ── G331: distributed quantile from per-shard ladders ──────────────
    // 16 md5 shards each publish their exact 21-point nearest-rank
    // ladder (k/20 quantiles, partitioned windows); the coordinator
    // answers a global quantile WITHOUT any global sort: ladder point
    // q carries the TELESCOPING weight rk(q) − rk(q−1) (point 0 carries
    // rk(0)), so each shard's weights sum to exactly n_s and no mass is
    // floored away; points sort by value and the answer is the first
    // point whose cumulative weight reaches p·N (the cumulative runs on
    // the 336-row ladder union — metadata scale). Audited against the
    // exact global nearest-rank quantile: the true rank of the estimate
    // must sit within N div 10 of the target (per-shard ladders bound
    // rank error by their max gap ≈ n_s div 20 each).
    "q386_shard_quantiles" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
        .withColumn("sh", expr(
          "cast(conv(substring(md5(cast(k as string)), 1, 4), 16, 10) as bigint) % 16"))
      val shardN = o.groupBy("sh").agg(count(lit(1)).as("ns"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy("sh").orderBy(col("v").asc, col("k").asc)
      val pts = o.withColumn("rk", row_number().over(wRank))
        .join(shardN, Seq("sh"))
        .crossJoin(broadcast(s.range(0, 21).select(col("id").as("q"))))
        .filter(col("rk") === expr("greatest(1L, (ns * q + 19) div 20)"))
        .select(col("sh"), col("q"), col("v"), col("rk"))
        .distinct()
      val ladder = pts.as("a")
        .join(pts.select(col("sh").as("psh"), col("q").as("pq"), col("rk").as("prk")).as("b"),
          col("a.sh") === col("psh") && col("pq") === col("a.q") - 1, "left")
        .select(col("a.sh").as("sh"), col("a.q").as("q"), col("a.v").as("v"),
          (col("a.rk") - coalesce(col("prk"), lit(0L))).as("w"))
      val n = o.agg(count(lit(1)).as("n_total"))
      // cumulative weight over the tiny ladder union (triangular join)
      val cum = ladder.as("a").join(ladder.as("b"),
          col("b.v") < col("a.v") || (col("b.v") === col("a.v") &&
            (col("b.sh") < col("a.sh") || (col("b.sh") === col("a.sh") && col("b.q") < col("a.q")))))
        .groupBy(col("a.v").as("v"), col("a.sh").as("sh"), col("a.q").as("qq"), col("a.w").as("w"))
        .agg(sum(col("b.w")).as("cw_before"))
        .unionByName(ladder.select(col("v"), col("sh"), col("q").as("qq"), col("w"))
          .withColumn("cw_before", lit(null).cast(LongType)))
        .groupBy("v", "sh", "qq", "w")
        .agg(coalesce(max("cw_before"), lit(0L)).as("cwb"))
      val targets = s.range(0, 3).select(
        expr("element_at(array(50L, 90L, 99L), cast(id + 1 as int))").as("p"))
      val est = cum.crossJoin(broadcast(targets)).crossJoin(broadcast(n))
        .filter(expr("cwb + w >= p * n_total div 100"))
        .groupBy("p", "n_total")
        .agg(min(struct(col("v"), col("sh"), col("qq"))).as("first"))
        .select(col("p"), col("n_total"), col("first.v").as("est_v"))
      // exact true rank of the estimate in the full data
      val ranks = est.join(o, col("v") <= col("est_v"), "left")
        .groupBy("p", "n_total", "est_v")
        .agg(count(col("v")).as("true_rank"))
        .withColumn("target_rank", expr("p * n_total div 100"))
        .withColumn("rank_err", expr("abs(true_rank - target_rank)"))
        .withColumn("within_bound", expr("rank_err <= n_total div 10"))
      ranks.select("p", "n_total", "est_v", "true_rank", "target_rank",
          "rank_err", "within_bound")
        .orderBy("p")
    }),

    // ── G332: late-arriving-dimension reconciliation ───────────────────
    // A third of the customer dim (md5-picked) "arrives late": phase 1
    // joins orders against the early dim and books unmatched revenue
    // into the 'unknown' bucket; phase 2 (after backfill) re-resolves.
    // The ledger: per nation, phase-1 known revenue, revenue
    // RECLASSIFIED out of unknown by the backfill, and the certificate
    // that known + reclassified = phase-2 total (gap emitted, zero).
    // This is the unknown-member pattern every warehouse dimension
    // load needs — with the reconciliation made first-class.
    "q387_late_dimension" -> ((s, dir) => {
      val dim = Tables.customer(s, dir).select(col("c_custkey").as("ck"),
          col("c_nationkey").cast(LongType).as("nat"))
        .withColumn("late", expr(
          "cast(conv(substring(md5(cast(ck as string)), 1, 5), 16, 10) as bigint) % 3 = 0"))
      val o = Tables.orders(s, dir).select(col("o_custkey").as("ck"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v_c"))
      val phase1 = o.join(dim.filter(!col("late")), Seq("ck"), "left")
        .groupBy(coalesce(col("nat"), lit(-1L)).as("nat"))
        .agg(sum("v_c").as("rev_p1"), count(lit(1)).as("n_p1"))
      val phase2 = o.join(dim, Seq("ck"))
        .groupBy("nat")
        .agg(sum("v_c").as("rev_p2"), count(lit(1)).as("n_p2"))
      val reclass = o.join(dim.filter(col("late")), Seq("ck"))
        .groupBy("nat")
        .agg(sum("v_c").as("rev_reclassified"), count(lit(1)).as("n_reclassified"))
      phase2.join(phase1, Seq("nat"), "left")
        .join(reclass, Seq("nat"), "left")
        .select(col("nat"),
          coalesce(col("rev_p1"), lit(0L)).as("rev_p1_known"),
          coalesce(col("rev_reclassified"), lit(0L)).as("rev_reclassified"),
          col("rev_p2"),
          (col("rev_p2") - coalesce(col("rev_p1"), lit(0L))
            - coalesce(col("rev_reclassified"), lit(0L))).as("gap_c"))
        .orderBy("nat")
    }),

    // ── G333: price-volume-mix revenue bridge ──────────────────────────
    // Month-over-month revenue delta for the last two data-anchored
    // months, decomposed per part present in both months: price effect
    // (Δunit-price × old qty), volume effect (old price × Δqty), cross
    // term, plus new-part and discontinued-part revenue. Unit prices
    // are rationals, so each effect floors once at cents (documented);
    // the identity delta = price + volume + cross + new − lost then
    // holds up to a per-part ±2 rounding residual, emitted explicitly
    // and bounded — a bridge that hides its rounding is a bridge
    // nobody should trust. One corpus pass to (month, part) grain.
    "q388_pvm_bridge" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM").as("m")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("m"), col("l_partkey").as("p"),
          expr("cast(l_quantity as bigint)").as("q"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)").as("r"))
      val months = li.select("m").distinct()
        .orderBy(col("m").desc).limit(2)
        .orderBy(col("m").asc)
        .agg(min("m").as("m0"), max("m").as("m1"))
      val cells = li.join(broadcast(months),
          col("m") === col("m0") || col("m") === col("m1"))
        .groupBy("p")
        .agg(sum(when(col("m") === col("m0"), col("q")).otherwise(0L)).as("q0"),
          sum(when(col("m") === col("m0"), col("r")).otherwise(0L)).as("r0"),
          sum(when(col("m") === col("m1"), col("q")).otherwise(0L)).as("q1"),
          sum(when(col("m") === col("m1"), col("r")).otherwise(0L)).as("r1"))
      val both = cells.filter(col("q0") > 0 && col("q1") > 0)
        // price effect = (r1/q1 − r0/q0)·q0, floored once at cents
        .withColumn("price_eff", expr("r1 * q0 div q1 - r0"))
        .withColumn("vol_eff", expr("r0 * (q1 - q0) div q0"))
        .withColumn("cross_eff", expr(
          "(r1 - r0) - (r1 * q0 div q1 - r0) - (r0 * (q1 - q0) div q0)"))
      val eff = both.agg(
        count(lit(1)).as("n_parts_both"),
        sum(expr("r1 - r0")).as("delta_both"),
        sum("price_eff").as("price_eff"),
        sum("vol_eff").as("vol_eff"),
        sum("cross_eff").as("cross_eff"))
      val edges = cells.agg(
        sum(when(col("q0") === 0, col("r1")).otherwise(0L)).as("new_c"),
        sum(when(col("q1") === 0, col("r0")).otherwise(0L)).as("lost_c"),
        sum(expr("r1 - r0")).as("delta_total"))
      eff.crossJoin(broadcast(edges))
        .withColumn("bridge_gap", expr(
          "delta_total - (price_eff + vol_eff + cross_eff + new_c - lost_c)"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q385_snapshot_resume" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid,
        |              CAST(round(value * 1000000) AS BIGINT) *
        |                (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END) AS dx6
        |            FROM events WHERE event_type IN ('purchase', 'error')),
        |cut AS (SELECT MIN(us) + (MAX(us) - MIN(us)) * 6 // 10 AS t FROM ev),
        |arr AS (SELECT u,
        |          list(dx6 ORDER BY us, eid, dx6, us <= t) AS all_dx,
        |          list(dx6 ORDER BY us, eid, dx6) FILTER (WHERE us <= t) AS head_dx,
        |          list(dx6 ORDER BY us, eid, dx6) FILTER (WHERE us > t) AS tail_dx
        |        FROM ev, cut GROUP BY u),
        |folded AS (SELECT u,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), all_dx),
        |      (a, x) -> GREATEST(a + x, 0)) AS direct,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), COALESCE(head_dx, [])),
        |      (a, x) -> GREATEST(a + x, 0)) AS snap
        |  FROM arr),
        |resumed AS (SELECT folded.u, direct,
        |    list_reduce(list_prepend(snap, COALESCE(tail_dx, [])),
        |      (a, x) -> GREATEST(a + x, 0)) AS resumed
        |  FROM folded JOIN arr ON folded.u = arr.u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(CASE WHEN direct != resumed THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |       CAST(SUM(direct) AS BIGINT) AS total_balance6,
        |       bit_xor(CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
        |         CAST(direct AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_balances
        |FROM resumed""".stripMargin,

    "q386_shard_quantiles" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT)
        |               % 16 AS sh
        |           FROM orders),
        |sn AS (SELECT sh, COUNT(*) AS ns FROM o GROUP BY sh),
        |rkd AS (SELECT o.*, ns, ROW_NUMBER() OVER (PARTITION BY o.sh ORDER BY v, k) AS rk
        |        FROM o JOIN sn ON o.sh = sn.sh),
        |pts AS (SELECT DISTINCT rkd.sh, q.q, v, rk
        |        FROM rkd CROSS JOIN (SELECT UNNEST(range(0, 21)) AS q) q
        |        WHERE rk = GREATEST(1, (ns * q.q + 19) // 20)),
        |ladder AS (SELECT a.sh, a.q, a.v, a.rk - COALESCE(b.rk, 0) AS w
        |           FROM pts a LEFT JOIN pts b ON a.sh = b.sh AND b.q = a.q - 1),
        |n AS (SELECT COUNT(*) AS n_total FROM o),
        |cum AS (SELECT a.v, a.sh, a.q AS qq, a.w,
        |          COALESCE(SUM(b.w), 0) AS cwb
        |        FROM ladder a LEFT JOIN ladder b
        |          ON b.v < a.v OR (b.v = a.v AND (b.sh < a.sh OR (b.sh = a.sh AND b.q < a.q)))
        |        GROUP BY a.v, a.sh, a.q, a.w),
        |targets AS (SELECT UNNEST([50, 90, 99]) AS p),
        |est AS (SELECT p, n_total, MIN(ROW(v, sh, qq))[1] AS est_v
        |        FROM cum, targets, n
        |        WHERE cwb + w >= p * n_total // 100
        |        GROUP BY p, n_total),
        |ranks AS (SELECT p, n_total, est_v,
        |            (SELECT COUNT(*) FROM o WHERE v <= est_v) AS true_rank
        |          FROM est)
        |SELECT CAST(p AS BIGINT) AS p, CAST(n_total AS BIGINT) AS n_total,
        |       CAST(est_v AS BIGINT) AS est_v,
        |       CAST(true_rank AS BIGINT) AS true_rank,
        |       CAST(p * n_total // 100 AS BIGINT) AS target_rank,
        |       CAST(ABS(true_rank - p * n_total // 100) AS BIGINT) AS rank_err,
        |       ABS(true_rank - p * n_total // 100) <= n_total // 10 AS within_bound
        |FROM ranks ORDER BY p""".stripMargin,

    "q387_late_dimension" ->
      """WITH dim AS (SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS nat,
        |               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 5) AS BIGINT)
        |                 % 3 = 0 AS late
        |             FROM customer),
        |o AS (SELECT o_custkey AS ck, CAST(round(o_totalprice * 100) AS BIGINT) AS v_c
        |      FROM orders),
        |p1 AS (SELECT COALESCE(nat, -1) AS nat, SUM(v_c) AS rev_p1
        |       FROM o LEFT JOIN (SELECT * FROM dim WHERE NOT late) d ON o.ck = d.ck
        |       GROUP BY 1),
        |p2 AS (SELECT nat, SUM(v_c) AS rev_p2 FROM o JOIN dim ON o.ck = dim.ck GROUP BY nat),
        |rc AS (SELECT nat, SUM(v_c) AS rev_reclassified
        |       FROM o JOIN (SELECT * FROM dim WHERE late) d ON o.ck = d.ck GROUP BY nat)
        |SELECT CAST(p2.nat AS BIGINT) AS nat,
        |       CAST(COALESCE(rev_p1, 0) AS BIGINT) AS rev_p1_known,
        |       CAST(COALESCE(rev_reclassified, 0) AS BIGINT) AS rev_reclassified,
        |       CAST(rev_p2 AS BIGINT) AS rev_p2,
        |       CAST(rev_p2 - COALESCE(rev_p1, 0) - COALESCE(rev_reclassified, 0) AS BIGINT) AS gap_c
        |FROM p2 LEFT JOIN p1 ON p2.nat = p1.nat LEFT JOIN rc ON p2.nat = rc.nat
        |ORDER BY nat""".stripMargin,

    "q388_pvm_bridge" ->
      """WITH li AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
        |              l_partkey AS p, CAST(l_quantity AS BIGINT) AS q,
        |              CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS r
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |mm AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM
        |         (SELECT DISTINCT m FROM li ORDER BY m DESC LIMIT 2) z),
        |cells AS (SELECT p,
        |            SUM(CASE WHEN m = m0 THEN q ELSE 0 END) AS q0,
        |            SUM(CASE WHEN m = m0 THEN r ELSE 0 END) AS r0,
        |            SUM(CASE WHEN m = m1 THEN q ELSE 0 END) AS q1,
        |            SUM(CASE WHEN m = m1 THEN r ELSE 0 END) AS r1
        |          FROM li, mm WHERE m = m0 OR m = m1 GROUP BY p),
        |bth AS (SELECT *,
        |           r1 * q0 // q1 - r0 AS price_eff,
        |           r0 * (q1 - q0) // q0 AS vol_eff,
        |           (r1 - r0) - (r1 * q0 // q1 - r0) - (r0 * (q1 - q0) // q0) AS cross_eff
        |         FROM cells WHERE q0 > 0 AND q1 > 0),
        |eff AS (SELECT COUNT(*) AS n_parts_both, SUM(r1 - r0) AS delta_both,
        |          SUM(price_eff) AS price_eff, SUM(vol_eff) AS vol_eff,
        |          SUM(cross_eff) AS cross_eff
        |        FROM bth),
        |edges AS (SELECT SUM(CASE WHEN q0 = 0 THEN r1 ELSE 0 END) AS new_c,
        |            SUM(CASE WHEN q1 = 0 THEN r0 ELSE 0 END) AS lost_c,
        |            SUM(r1 - r0) AS delta_total
        |          FROM cells)
        |SELECT CAST(n_parts_both AS BIGINT) AS n_parts_both,
        |       CAST(delta_both AS BIGINT) AS delta_both,
        |       CAST(price_eff AS BIGINT) AS price_eff,
        |       CAST(vol_eff AS BIGINT) AS vol_eff,
        |       CAST(cross_eff AS BIGINT) AS cross_eff,
        |       CAST(new_c AS BIGINT) AS new_c, CAST(lost_c AS BIGINT) AS lost_c,
        |       CAST(delta_total AS BIGINT) AS delta_total,
        |       CAST(delta_total - (price_eff + vol_eff + cross_eff + new_c - lost_c) AS BIGINT) AS bridge_gap
        |FROM eff, edges""".stripMargin
  )
}
