package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parity-and-replay subsystem (round 10, fifty-sixth wave): the
  * higher-order-function semantics matrix, a leakage-free next-event
  * prediction eval, a mergeable KMV trailing-window rollup, and the
  * per-segment metric-parity (fairness) audit.
  *
  * Reference intent: the reference manipulates per-store arrays in
  * pandas (services/training-service/app/train_utils.py) and evaluates
  * nothing beyond point error; none of its dashboards ask "is the
  * metric the same for every segment?". q397 pins Spark's
  * transform/filter/exists/forall/zip_with/slice/aggregate lambda
  * semantics on basket arrays against a RELATIONAL oracle (the oracle
  * re-derives every value with plain GROUP BY + CASE — deliberately
  * not DuckDB's list lambdas, so an engine-side HOF bug cannot be
  * mirrored by an oracle-side one). q398 is the sequence-model eval
  * loop: train a bigram argmax on the first 80 % of time, score on
  * the rest, against the majority-class baseline. q399 is the
  * mergeability property sketches exist for: daily bottom-64 KMV
  * signatures unioned over a trailing 7-day window vs the exact
  * trailing distinct count, error certified per day. q400 computes
  * per-segment AUC + positive-rate parity — per-group windows only
  * (partitioned by segment), never global.
  */
object ParityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G342: higher-order-function semantics matrix ───────────────────
    // Per-order basket arrays (prices, quantities, sorted by the
    // (linenumber, cents, qty) total order — linenumbers DUPLICATE in
    // this corpus, q389's finding). Exercised lambdas: transform
    // (8 % tax), aggregate (fold sum), filter (above integer basket
    // mean), exists / forall (threshold tests), zip_with (price×qty
    // revenue), slice (first-2 sum). Every derived value lands in a
    // per-order row xor'd + summed into one census row; the oracle
    // computes the same values RELATIONALLY (GROUP BY + CASE), so both
    // sides cannot share a lambda-evaluation bug. Basket-bounded
    // arrays; one corpus shuffle.
    "q397_hof_matrix" -> ((s, dir) => {
      val basket = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("ln"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("c"),
          expr("cast(l_quantity as bigint)").as("q"))
        .groupBy("k")
        .agg(expr("transform(array_sort(collect_list(struct(ln, c, q))), e -> e.c)").as("ps"),
          expr("transform(array_sort(collect_list(struct(ln, c, q))), e -> e.q)").as("qs"))
      val derived = basket
        .withColumn("sum_c", expr("aggregate(ps, 0L, (a, x) -> a + x)"))
        .withColumn("mean_c", expr("sum_c div size(ps)"))
        .select(col("k"),
          expr("size(ps)").as("n_items"),
          col("sum_c"),
          expr("aggregate(transform(ps, x -> x * 108 div 100), 0L, (a, x) -> a + x)").as("sum_taxed"),
          expr("size(filter(ps, x -> x > mean_c))").as("n_above_mean"),
          expr("case when exists(ps, x -> x > 5000000) then 1L else 0L end").as("has_big"),
          expr("case when forall(ps, x -> x > 0) then 1L else 0L end").as("all_pos"),
          expr("aggregate(zip_with(ps, qs, (p, q) -> p * q), 0L, (a, x) -> a + x)").as("rev"),
          expr("aggregate(slice(ps, 1, 2), 0L, (a, x) -> a + x)").as("first2"))
      derived.agg(count(lit(1)).as("n_orders"),
        sum("sum_c").as("tot_c"), sum("sum_taxed").as("tot_taxed"),
        sum("n_above_mean").as("tot_above_mean"),
        sum("has_big").as("n_has_big"), sum("all_pos").as("n_all_pos"),
        sum("rev").as("tot_rev"), sum("first2").as("tot_first2"),
        expr("bit_xor(md5_60(concat(cast(k as string), ':', cast(sum_taxed as string)," +
          " ':', cast(n_above_mean as string), ':', cast(rev as string)," +
          " ':', cast(first2 as string))))").as("xor60_rows"))
    }),

    // ── G343: leakage-free next-event prediction eval (bigram argmax) ──
    // Split time at the data-anchored 80 % point T. Train: per
    // prev-type, the argmax next-type by (count desc, type asc) over
    // consecutive pairs with BOTH events ≤ T; also the train-global
    // majority type (the baseline and the unseen-prev fallback). Test:
    // pairs with both events > T (pairs straddling T belong to
    // neither — no leakage in either direction). Accuracy vs the
    // majority baseline, both e4. lag windows partitioned per user;
    // model and baseline are |event-type|-grain broadcasts.
    "q398_nextevent_eval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("t"))
      val bounds = ev.agg(min("us").as("lo"), max("us").as("hi"))
      val w = Window.partitionBy("u").orderBy(col("us"), col("eid"))
      val pairs = ev.withColumn("nt", lead("t", 1).over(w))
        .withColumn("nus", lead("us", 1).over(w))
        .filter(col("nt").isNotNull)
        .crossJoin(broadcast(bounds))
        .withColumn("cut", expr("lo + (hi - lo) * 8 div 10"))
      val train = pairs.filter(col("nus") <= col("cut"))
      // argmax by (count, type) lexicographic — ties go to the LAST type
      // name, deterministic and mirrored by the windowed-max oracle form
      val model = train.groupBy("t", "nt").agg(count(lit(1)).as("c"))
        .groupBy("t").agg(max(struct(col("c"), col("nt"))).as("m"))
        .select(col("t").as("mt"), col("m.nt").as("pred"))
      val majority = train.groupBy("nt").agg(count(lit(1)).as("c"))
        .agg(max(struct(col("c"), col("nt"))).as("m"))
        .select(col("m.nt").as("maj"))
      val test = pairs.filter(col("us") > col("cut"))
      test.join(broadcast(model), col("t") === col("mt"), "left")
        .crossJoin(broadcast(majority))
        .withColumn("phat", coalesce(col("pred"), col("maj")))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("phat") === col("nt"), 1L).otherwise(0L)).as("n_hit"),
          sum(when(col("maj") === col("nt"), 1L).otherwise(0L)).as("n_base_hit"))
        .withColumn("acc_e4", expr("n_hit * 10000 div n_test"))
        .withColumn("base_acc_e4", expr("n_base_hit * 10000 div n_test"))
        .withColumn("lift_e4", expr("acc_e4 - base_acc_e4"))
    }),

    // ── G344: KMV trailing-window rollup (mergeable-sketch property) ───
    // Daily bottom-64 KMV signature of distinct users (60-bit md5
    // space, per-day rank window — PARTITIONED by day). Trailing 7-day
    // union = bottom-64 of the 7 daily signatures' union (≤ 448 hashes
    // per day — metadata-scale), estimate (k−1)·2⁶⁰ div h_k (or the
    // exact union size when < 64 survive the union cap — then the
    // union IS the set). Certified per day against the exact trailing
    // distinct (7-offset explode of the user-day grain, q76's rolling-
    // distinct rewrite). This is WHY sketches ship: the union needs
    // the signatures only, never the raw days.
    "q399_kmv_rollup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ud = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id").as("u")).distinct()
        .withColumn("h", expr("md5_60(cast(u as string))"))
        .localCheckpoint(true)
      val daily = ud
        .withColumn("rk", row_number().over(Window.partitionBy("d").orderBy("h")))
        .filter(col("rk") <= 64)
      val offsets = s.range(0, 7).select(col("id").as("off"))
      // the union DEDUPS first (a user active on several of the 7 days
      // contributes ONE hash), then re-caps at bottom-64; the numerator
      // 63·2⁶⁰ overflows BIGINT, hence the DECIMAL(38,0) lift
      val trailing = daily.crossJoin(broadcast(offsets))
        .select(date_add(col("d"), col("off").cast("int")).as("td"), col("h"))
        .distinct()
        .withColumn("rk2", row_number().over(Window.partitionBy("td").orderBy("h")))
        .filter(col("rk2") <= 64)
        .groupBy("td").agg(count(lit(1)).as("n_sig"), max("h").as("hk"))
        .withColumn("est", expr(
          "case when n_sig < 64 then n_sig" +
            " else cast(cast(63 as decimal(38,0)) * 1152921504606846976 div hk as bigint) end"))
      val exact = ud.select(col("d"), col("u")).crossJoin(broadcast(offsets))
        .select(date_add(col("d"), col("off").cast("int")).as("td2"), col("u"))
        .distinct().groupBy("td2").agg(count(lit(1)).as("exact"))
      // certified region: days with a FULL 7-day lookback in the data
      val span = ud.agg(min("d").as("d0"), max("d").as("d1"))
      trailing.join(exact, col("td") === col("td2"))
        .crossJoin(broadcast(span))
        .filter(col("td") >= date_add(col("d0"), 6) && col("td") <= col("d1"))
        .withColumn("err_e4", expr("abs(est - exact) * 10000 div exact"))
        .agg(count(lit(1)).as("n_days"),
          sum("exact").as("sum_exact"),
          max("err_e4").as("max_err_e4"),
          expr("sum(err_e4) div count(1)").as("mean_err_e4"),
          expr("bit_xor(md5_60(concat(cast(td as string), ':', cast(est as string)," +
            " ':', cast(exact as string))))").as("xor60_days"))
    }),

    // ── G345: per-segment metric parity (fairness audit) ───────────────
    // q393's exact AUC computed PER market segment (score-grain
    // windows partitioned by segment — never global), plus each
    // segment's positive rate; parity gaps (max−min over segments)
    // broadcast back onto every row. The audit a training pipeline
    // runs before shipping a model: same ranking quality for every
    // segment, base rates disclosed. Segment-grain output (5 rows).
    "q400_metric_parity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("sc"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("p"))
      val g = o.groupBy("seg", "sc").agg(sum("p").as("np"), sum(expr("1 - p")).as("nn"))
      val cum = g.withColumn("cumneg",
        sum("nn").over(Window.partitionBy("seg").orderBy("sc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perSeg = cum.groupBy("seg")
        .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
          sum(expr("2 * np * (cumneg - nn) + np * nn")).as("u2"))
        .withColumn("auc_e6", expr(
          "cast(cast(u2 as decimal(38,0)) * 1000000" +
            " div greatest(cast(n_pos as decimal(38,0)) * n_neg * 2, 1) as bigint)"))
        .withColumn("pos_rate_e6", expr("n_pos * 1000000 div (n_pos + n_neg)"))
      val gaps = perSeg.agg(
        (max("auc_e6") - min("auc_e6")).as("auc_gap_e6"),
        (max("pos_rate_e6") - min("pos_rate_e6")).as("rate_gap_e6"))
      perSeg.crossJoin(broadcast(gaps))
        .select("seg", "n_pos", "n_neg", "auc_e6", "pos_rate_e6",
          "auc_gap_e6", "rate_gap_e6")
        .orderBy("seg")
    })
  )

  def oracleSql: Map[String, String] = Map(

    // relational re-derivation on purpose: no DuckDB list lambdas, so
    // the two engines cannot share a lambda-evaluation bug
    "q397_hof_matrix" ->
      """WITH li AS (SELECT l_orderkey AS k, CAST(l_linenumber AS BIGINT) AS ln,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
        |             CAST(l_quantity AS BIGINT) AS q
        |           FROM lineitem),
        |ord AS (SELECT k, c, q,
        |          ROW_NUMBER() OVER (PARTITION BY k ORDER BY ln, c, q) AS pos
        |        FROM li),
        |per AS (SELECT k, COUNT(*) AS n_items, SUM(c) AS sum_c,
        |          SUM(c * 108 // 100) AS sum_taxed,
        |          SUM(c * q) AS rev,
        |          SUM(CASE WHEN pos <= 2 THEN c ELSE 0 END) AS first2,
        |          MAX(CASE WHEN c > 5000000 THEN 1 ELSE 0 END) AS has_big,
        |          MIN(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS all_pos
        |        FROM ord GROUP BY k),
        |am AS (SELECT o.k, COUNT(*) AS n_above_mean
        |       FROM ord o JOIN per p ON o.k = p.k
        |       WHERE o.c > p.sum_c // p.n_items GROUP BY o.k),
        |rows_ AS (SELECT p.k, p.sum_c, p.sum_taxed, p.rev, p.first2,
        |            p.has_big, p.all_pos, COALESCE(a.n_above_mean, 0) AS n_above_mean
        |          FROM per p LEFT JOIN am a ON p.k = a.k)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(sum_c) AS BIGINT) AS tot_c,
        |       CAST(SUM(sum_taxed) AS BIGINT) AS tot_taxed,
        |       CAST(SUM(n_above_mean) AS BIGINT) AS tot_above_mean,
        |       CAST(SUM(has_big) AS BIGINT) AS n_has_big,
        |       CAST(SUM(all_pos) AS BIGINT) AS n_all_pos,
        |       CAST(SUM(rev) AS BIGINT) AS tot_rev,
        |       CAST(SUM(first2) AS BIGINT) AS tot_first2,
        |       bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |         CAST(sum_taxed AS VARCHAR) || ':' || CAST(n_above_mean AS VARCHAR) || ':' ||
        |         CAST(rev AS VARCHAR) || ':' || CAST(first2 AS VARCHAR)), 1, 15) AS BIGINT))
        |         AS xor60_rows
        |FROM rows_""".stripMargin,

    "q398_nextevent_eval" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid,
        |             event_type AS t
        |           FROM events),
        |bounds AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
        |pairs AS (SELECT u, us, t,
        |            LEAD(t) OVER (PARTITION BY u ORDER BY us, eid) AS nt,
        |            LEAD(us) OVER (PARTITION BY u ORDER BY us, eid) AS nus
        |          FROM ev),
        |pc AS (SELECT p.*, lo + (hi - lo) * 8 // 10 AS cut FROM pairs p, bounds
        |       WHERE nt IS NOT NULL),
        |train AS (SELECT * FROM pc WHERE nus <= cut),
        |tc AS (SELECT t, nt, COUNT(*) AS c FROM train GROUP BY t, nt),
        |model AS (SELECT t AS mt, MAX(nt) AS pred FROM
        |            (SELECT *, MAX(c) OVER (PARTITION BY t) AS mc FROM tc) z
        |          WHERE c = mc GROUP BY t),
        |gc AS (SELECT nt, COUNT(*) AS c FROM train GROUP BY nt),
        |maj AS (SELECT MAX(nt) AS maj FROM gc
        |        WHERE c = (SELECT MAX(c) FROM gc)),
        |test AS (SELECT pc.t, pc.nt, COALESCE(m.pred, j.maj) AS phat, j.maj
        |         FROM pc LEFT JOIN model m ON pc.t = m.mt CROSS JOIN maj j
        |         WHERE pc.us > pc.cut)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
        |       CAST(SUM(CASE WHEN phat = nt THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |       CAST(SUM(CASE WHEN maj = nt THEN 1 ELSE 0 END) AS BIGINT) AS n_base_hit,
        |       CAST(SUM(CASE WHEN phat = nt THEN 1 ELSE 0 END) * 10000
        |            // COUNT(*) AS BIGINT) AS acc_e4,
        |       CAST(SUM(CASE WHEN maj = nt THEN 1 ELSE 0 END) * 10000
        |            // COUNT(*) AS BIGINT) AS base_acc_e4,
        |       CAST(SUM(CASE WHEN phat = nt THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |            - SUM(CASE WHEN maj = nt THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |            AS BIGINT) AS lift_e4
        |FROM test""".stripMargin,

    "q399_kmv_rollup" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
        |uh AS (SELECT d, u, CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15)
        |         AS BIGINT) AS h FROM ud),
        |daily AS (SELECT d, h FROM
        |            (SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rk
        |             FROM uh) z WHERE rk <= 64),
        |tr AS (SELECT DISTINCT d + INTERVAL (off) DAY AS td, h
        |       FROM daily CROSS JOIN (SELECT UNNEST(range(0, 7)) AS off) o),
        |tk AS (SELECT td, h FROM
        |         (SELECT td, h, ROW_NUMBER() OVER (PARTITION BY td ORDER BY h) AS rk2
        |          FROM tr) z WHERE rk2 <= 64),
        |sig AS (SELECT td, COUNT(*) AS n_sig, MAX(h) AS hk FROM tk GROUP BY td),
        |est AS (SELECT td, CASE WHEN n_sig < 64 THEN n_sig
        |                        ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976
        |                             // hk AS BIGINT) END AS est
        |        FROM sig),
        |ex AS (SELECT td2, COUNT(*) AS exact FROM
        |         (SELECT DISTINCT d + INTERVAL (off) DAY AS td2, u
        |          FROM ud CROSS JOIN (SELECT UNNEST(range(0, 7)) AS off) o) z
        |       GROUP BY td2),
        |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
        |cert AS (SELECT e.td, e.est, x.exact,
        |           abs(e.est - x.exact) * 10000 // x.exact AS err_e4
        |         FROM est e JOIN ex x ON e.td = x.td2, span
        |         WHERE e.td >= d0 + INTERVAL 6 DAY AND e.td <= CAST(d1 AS TIMESTAMP))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(exact) AS BIGINT) AS sum_exact,
        |       CAST(MAX(err_e4) AS BIGINT) AS max_err_e4,
        |       CAST(SUM(err_e4) // COUNT(*) AS BIGINT) AS mean_err_e4,
        |       bit_xor(CAST('0x' || substr(md5(strftime(td, '%Y-%m-%d') || ':' ||
        |         CAST(est AS VARCHAR) || ':' || CAST(exact AS VARCHAR)), 1, 15) AS BIGINT))
        |         AS xor60_days
        |FROM cert""".stripMargin,

    "q400_metric_parity" ->
      """WITH o AS (SELECT c_mktsegment AS seg,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
        |             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                  THEN 1 ELSE 0 END AS p
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT seg, sc, SUM(p) AS np, SUM(1 - p) AS nn
        |      FROM o GROUP BY seg, sc),
        |c AS (SELECT *, SUM(nn) OVER (PARTITION BY seg ORDER BY sc
        |        ROWS UNBOUNDED PRECEDING) AS cumneg FROM g),
        |per AS (SELECT seg, SUM(np) AS n_pos, SUM(nn) AS n_neg,
        |          SUM(2 * np * (cumneg - nn) + np * nn) AS u2
        |        FROM c GROUP BY seg),
        |m AS (SELECT seg, n_pos, n_neg,
        |        CAST(CAST(u2 AS HUGEINT) * 1000000
        |          // GREATEST(CAST(n_pos AS HUGEINT) * n_neg * 2, 1) AS BIGINT) AS auc_e6,
        |        n_pos * 1000000 // (n_pos + n_neg) AS pos_rate_e6
        |      FROM per),
        |gaps AS (SELECT MAX(auc_e6) - MIN(auc_e6) AS auc_gap_e6,
        |           MAX(pos_rate_e6) - MIN(pos_rate_e6) AS rate_gap_e6 FROM m)
        |SELECT seg, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |       CAST(auc_e6 AS BIGINT) AS auc_e6,
        |       CAST(pos_rate_e6 AS BIGINT) AS pos_rate_e6,
        |       CAST(auc_gap_e6 AS BIGINT) AS auc_gap_e6,
        |       CAST(rate_gap_e6 AS BIGINT) AS rate_gap_e6
        |FROM m, gaps ORDER BY seg""".stripMargin
  )
}
