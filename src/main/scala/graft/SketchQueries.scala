package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic-sketch and sequential-estimator wave (round 10,
  * sixty-second wave): Misra–Gries heavy hitters with the mergeable
  * deficit guarantee run as data, HyperLogLog built from raw
  * registers, Croston/SBA intermittent-demand forecasting, and the
  * Cramér–von Mises two-sample drift test.
  *
  * Reference intent: the reference counts everything exactly in
  * PostgreSQL (services/db) — fine at 10⁵ rows, impossible at 10¹².
  * q421 is the deterministic counter-based heavy-hitter summary
  * (Misra–Gries 1982): 512 shard folds of k=8 counters each, merged by
  * plain addition, with BOTH sides of the ε-deficit guarantee
  * (est ≤ true ≤ est + Σ⌊n_s/(k+1)⌋) counted against exact truth.
  * q422 builds HyperLogLog (Flajolet et al. 2007) from scratch — 256
  * registers, leading-zero ranks via binary-string length (never a
  * float log), the harmonic mean evaluated over a common 2⁵³
  * denominator — and grades it against the exact distinct count.
  * q423 completes q346's intermittent-demand router with the actual
  * Croston/SBA forecaster (SES folds on demand sizes AND
  * inter-arrival gaps, e3 state, α=1/8 shift-divide), scored on a
  * data-anchored holdout against the naive rate. q424 completes the
  * drift-test family (KS q147, χ² q138) with the Cramér–von Mises
  * statistic from the exact rank identity — cross-sample "belows"
  * from ONE packed prefix sum, never a global window.
  */
object SketchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G366: Misra–Gries mergeable heavy hitters ──────────────────────
    // Items: user ids over the event stream. 512 shards by md5(eid)
    // (sized so each shard's sequential fold — and the oracle's
    // recursive replay — stays a few hundred steps at sf0.1; the
    // merge-by-addition and deficit bound B = Σ_s ⌊n_s/(k+1)⌋ are
    // shard-count-agnostic, r11 gate-budget fix);
    // within a shard, the classic k=8 counter fold in (us, eid) order:
    // hit → increment; room → insert at 1; full → decrement ALL and
    // drop zeros. Shard summaries merge by addition (each keeps its
    // own deficit bound). Certified per item: est never exceeds truth,
    // truth − est never exceeds B = Σ_s ⌊n_s/(k+1)⌋, and every item
    // with truth > B is tracked — the coverage guarantee heavy-hitter
    // alerting stands on.
    "q421_misra_gries" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("it"), unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"))
        .withColumn("sh", expr("pmod(md5_60(cast(eid as string)), 512)"))
      val step =
        """(acc, z) -> case
          |  when exists(acc, e -> e.it = z.it)
          |    then transform(acc, e -> if(e.it = z.it,
          |         named_struct('it', e.it, 'c', e.c + 1L), e))
          |  when size(acc) < 8
          |    then array_append(acc, named_struct('it', z.it, 'c', 1L))
          |  else filter(transform(acc, e -> named_struct('it', e.it, 'c', e.c - 1L)),
          |       e -> e.c > 0L)
          |  end""".stripMargin
      val shards = ev.groupBy("sh")
        .agg(expr("array_sort(collect_list(struct(us, eid, it)))").as("xs"),
          count(lit(1)).as("n_s"))
        .withColumn("mg", expr(
          s"""aggregate(
             |  transform(xs, x -> named_struct('it', x.it)),
             |  cast(array() as array<struct<it: bigint, c: bigint>>),
             |  $step)""".stripMargin))
      val bound = shards.agg(sum(expr("n_s div 9")).as("b"),
        sum("n_s").as("n"), count(lit(1)).as("n_shards"))
      val est = shards
        .select(explode(col("mg")).as("e"))
        .groupBy(expr("e.it").as("it")).agg(sum(expr("e.c")).as("est"))
      val truth = ev.groupBy("it").agg(count(lit(1)).as("tru"))
      val joined = truth.join(est, Seq("it"), "left")
        .select(col("it"), col("tru"), coalesce(col("est"), lit(0L)).as("est"),
          when(col("est").isNotNull, 1L).otherwise(0L).as("tracked"))
        .crossJoin(broadcast(bound))
      val top = joined.orderBy(col("est").desc, col("it").asc).limit(1)
        .select(col("it").as("top_item"), col("est").as("top_est"))
      joined.agg(
          max("n").as("n"), max("n_shards").as("n_shards"),
          max("b").as("deficit_bound"),
          sum("tracked").as("n_tracked"),
          count(lit(1)).as("n_items"),
          sum(when(col("est") > col("tru"), 1L).otherwise(0L))
            .as("n_overestimates"),
          sum(when(col("tru") - col("est") > col("b"), 1L).otherwise(0L))
            .as("n_bound_violations"),
          sum(when(col("tracked") === 0L && col("tru") > col("b"), 1L)
            .otherwise(0L)).as("n_missed_heavy"))
        .crossJoin(broadcast(top))
    }),

    // ── G367: HyperLogLog from raw registers ───────────────────────────
    // Keys: lineitem order keys (≈4× duplicated — DISTINCT is earned,
    // not given). h = md5₆₀; bucket = top 8 bits, rank = leading
    // zeros of the 52-bit remainder + 1 via length(bin(rem)) — exact
    // integer, no float log. Register spine covers empty buckets
    // (rank 0). Estimate: α₂₅₆·m²/Σ2^(−M_j) over the common 2⁵³
    // denominator, α₂₅₆ = 0.7213/(1 + 1.079/256) as the design-time
    // e6 literal 718273 shared by both engines. Graded vs exact; the
    // 3σ band at m=256 is ±3·1.04/16 ≈ ±19.5 % (spec-pinned).
    // Small-range linear counting skipped: n ≫ 2.5·m at every SF.
    "q422_hll_scratch" -> ((s, dir) => {
      val h = Tables.lineitem(s, dir)
        .select(expr("md5_60(cast(l_orderkey as string))").as("h"),
          col("l_orderkey").as("k"))
        .select(col("k"), expr("h div 4503599627370496L").as("b"),
          expr("h % 4503599627370496L").as("rem"))
        .select(col("k"), col("b"),
          expr("case when rem = 0L then 53L else 53L - length(bin(rem)) end")
            .as("rank"))
      val regs = h.groupBy("b").agg(max("rank").as("m_j"))
      val spine = s.range(1)
        .select(explode(expr("sequence(0L, 255L)")).as("b"))
      val full = spine.join(regs, Seq("b"), "left")
        .select(col("b"), coalesce(col("m_j"), lit(0L)).as("m_j"))
      val exact = h.select("k").distinct().agg(count(lit(1)).as("n_exact"))
      full.agg(
          sum(expr("shiftleft(1L, cast(53 - m_j as int))")).as("den"),
          sum(when(col("m_j") === 0L, 1L).otherwise(0L)).as("n_zero_regs"),
          max("m_j").as("max_rank"))
        .withColumn("est", expr(
          """cast(cast(718273 as decimal(38, 0)) * 256 * 256
            |  * 9007199254740992 div (cast(den as decimal(38, 0)) * 1000000)
            |  as bigint)""".stripMargin))
        .crossJoin(broadcast(exact))
        .withColumn("err_e4", expr("(est - n_exact) * 10000 div n_exact"))
        .select("n_exact", "est", "err_e4", "n_zero_regs", "max_rank")
    }),

    // ── G368: Croston / SBA intermittent-demand forecast ───────────────
    // Per part, demand days (date-grain qty sums) split 80/20 by the
    // data-anchored day cut. The fold carries e3-scaled SES states for
    // demand SIZE and INTER-ARRIVAL (α=1/8 shift-divide, exact under
    // truncation), the interval state seeded by the second demand.
    // SBA rate = z·15/(16·v) per day (Syntetos–Boylan correction).
    // Parts need ≥3 train demands (v defined) and a nonempty holdout.
    // Scored at e6 per-day rate vs the holdout actual and the naive
    // train rate; the oracle replays the fold as a RECURSIVE CTE.
    "q423_croston_sba" -> ((s, dir) => {
      val dd = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("p"), to_date(col("l_shipdate")).as("d"),
          expr("cast(round(l_quantity) as bigint)").as("q"))
        .groupBy("p", "d").agg(sum("q").as("q"))
      val span = dd.agg(min("d").as("d0"), max("d").as("d1"))
        .select(col("d0"), datediff(col("d1"), col("d0")).cast("long").as("sp"))
      val days = dd.crossJoin(broadcast(span))
        .select(col("p"), datediff(col("d"), col("d0")).cast("long").as("i"),
          col("q"), expr("sp * 8 div 10").as("cut"), col("sp"))
      val zN = "(case when acc.seen = 0L then z.q * 1000L" +
        " else acc.z + (z.q * 1000L - acc.z) div 8L end)"
      val vN = "(case when acc.seen <= 0L then -1L" +
        " when acc.seen = 1L then (z.i - acc.last) * 1000L" +
        " else acc.v + ((z.i - acc.last) * 1000L - acc.v) div 8L end)"
      val train = days.filter(col("i") < col("cut"))
        .groupBy("p")
        .agg(expr("array_sort(collect_list(struct(i, q)))").as("xs"),
          count(lit(1)).as("n_demands"), sum("q").as("s_train"),
          max("cut").as("cut"), max("sp").as("sp"))
        .filter(col("n_demands") >= 3)
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('z', 0L, 'v', -1L, 'last', -1L, 'seen', 0L),
             |  (acc, z) -> named_struct(
             |    'z', $zN, 'v', $vN, 'last', z.i, 'seen', acc.seen + 1L))"""
            .stripMargin))
        .select(col("p"), col("n_demands"), col("s_train"), col("cut"),
          col("sp"), expr("st.z").as("z"), expr("st.v").as("v"))
      val hold = days.filter(col("i") >= col("cut"))
        .groupBy("p").agg(sum("q").as("a_hold"))
      val scoredParts = train.join(hold, Seq("p"), "left")
        .select(col("p"), col("z"), col("v"), col("s_train"), col("cut"),
          expr("sp - cut + 1").as("h_days"),
          coalesce(col("a_hold"), lit(0L)).as("a_hold"))
        .withColumn("pred_c_e6", expr("z * 937500L div v"))
        .withColumn("pred_n_e6", expr("s_train * 1000000L div cut"))
        .withColumn("actual_e6", expr("a_hold * 1000000L div h_days"))
        .withColumn("err_c", expr("abs(pred_c_e6 - actual_e6)"))
        .withColumn("err_n", expr("abs(pred_n_e6 - actual_e6)"))
      scoredParts.agg(count(lit(1)).as("n_parts"),
          sum("err_c").as("err_croston_sum_e6"),
          sum("err_n").as("err_naive_sum_e6"),
          sum(when(col("err_c") < col("err_n"), 1L).otherwise(0L))
            .as("croston_wins"),
          sum(when(col("err_c") > col("err_n"), 1L).otherwise(0L))
            .as("naive_wins"))
        .withColumn("err_ratio_e4", expr(
          "err_croston_sum_e6 * 10000 div err_naive_sum_e6"))
    }),

    // ── G369: Cramér–von Mises two-sample drift test ───────────────────
    // Samples: order prices (cents) for urgent (1-2) vs other
    // priorities, tie-broken by order key into a strict total order.
    // The rank identity: (rᵢ − i) for the i-th urgent value = count of
    // non-urgent values below it — so ONE packed prefix sum
    // (isB + isA·2³²) over (price, key) yields both Σ(rᵢ−i)² and
    // Σ(sⱼ−j)² without any global window. U = n·ΣA + m·ΣB lifts to
    // DECIMAL (3·10¹⁹ at sf0.1); T = U/(nmN) − (4nm−1)/(6N) at e6
    // against the 0.461 critical value (α=0.05).
    "q424_cvm_drift" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
          expr("case when cast(substring(o_orderpriority, 1, 1) as bigint) <= 2 " +
            "then 1L else 0L end").as("isa"))
        .withColumn("pk", expr("(1L - isa) + isa * 4294967296L"))
      val cum = graft.ops.Relational.prefixSum(
        base, Seq(col("v"), col("k")), "pk", "cumpk")
      val parts = cum
        .withColumn("cumb", expr("cumpk % 4294967296L"))
        .withColumn("cuma", expr("cumpk div 4294967296L"))
        .agg(sum("isa").as("n"), sum(expr("1L - isa")).as("m"),
          sum(expr("case when isa = 1L then cumb * cumb else 0L end")).as("sa2"),
          sum(expr("case when isa = 0L then cuma * cuma else 0L end")).as("sb2"))
      parts
        .withColumn("t_e6", expr(
          """cast((cast(n as decimal(38, 0)) * sa2 + cast(m as decimal(38, 0)) * sb2)
            |  * 1000000 div (cast(n as decimal(38, 0)) * m * (n + m))
            |  - (4 * cast(n as decimal(38, 0)) * m - 1) * 1000000
            |    div (6 * (cast(n as decimal(38, 0)) + m)) as bigint)"""
            .stripMargin))
        .withColumn("drift_flag", expr(
          "case when t_e6 > 461000L then 1L else 0L end"))
        .select("n", "m", "sa2", "sb2", "t_e6", "drift_flag")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q421_misra_gries" ->
      """WITH RECURSIVE ev AS MATERIALIZED (SELECT user_id AS it, epoch_us(ts) AS us,
        |    event_id AS eid,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 512 AS sh
        |  FROM events),
        |seq AS MATERIALIZED (SELECT sh, it, ROW_NUMBER() OVER
        |    (PARTITION BY sh ORDER BY us, eid) AS i FROM ev),
        |ns AS MATERIALIZED (SELECT sh, COUNT(*) AS n_s FROM ev GROUP BY sh),
        |rec AS (
        |  SELECT sh, i, [struct_pack(it := it, c := 1::BIGINT)] AS st
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.sh, s.i,
        |    CASE
        |      WHEN len(list_filter(r.st, e -> e.it = s.it)) > 0
        |        THEN list_transform(r.st, e -> CASE WHEN e.it = s.it
        |          THEN struct_pack(it := e.it, c := e.c + 1)
        |          ELSE e END)
        |      WHEN len(r.st) < 8
        |        THEN list_append(r.st, struct_pack(it := s.it, c := 1::BIGINT))
        |      ELSE list_filter(list_transform(r.st,
        |        e -> struct_pack(it := e.it, c := e.c - 1)), e -> e.c > 0)
        |    END
        |  FROM rec r JOIN seq s ON s.sh = r.sh AND s.i = r.i + 1),
        |fin AS (SELECT rec.sh, rec.st FROM rec JOIN ns ON rec.sh = ns.sh
        |        WHERE rec.i = ns.n_s),
        |est AS (SELECT u.it, SUM(u.c) AS est FROM
        |    (SELECT UNNEST(st) AS u FROM fin) z GROUP BY u.it),
        |tru AS (SELECT it, COUNT(*) AS tru FROM ev GROUP BY it),
        |bnd AS (SELECT SUM(n_s // 9) AS b, SUM(n_s) AS n,
        |    COUNT(*) AS n_shards FROM ns),
        |j AS (SELECT t.it, t.tru, COALESCE(e.est, 0) AS est,
        |    CASE WHEN e.est IS NOT NULL THEN 1 ELSE 0 END AS tracked
        |  FROM tru t LEFT JOIN est e ON t.it = e.it)
        |SELECT CAST(MAX(bnd.n) AS BIGINT) AS n,
        |  CAST(MAX(bnd.n_shards) AS BIGINT) AS n_shards,
        |  CAST(MAX(bnd.b) AS BIGINT) AS deficit_bound,
        |  CAST(SUM(tracked) AS BIGINT) AS n_tracked,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CASE WHEN est > tru THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overestimates,
        |  CAST(SUM(CASE WHEN tru - est > bnd.b THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bound_violations,
        |  CAST(SUM(CASE WHEN tracked = 0 AND tru > bnd.b THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missed_heavy,
        |  CAST((SELECT it FROM j ORDER BY est DESC, it LIMIT 1) AS BIGINT)
        |    AS top_item,
        |  CAST((SELECT est FROM j ORDER BY est DESC, it LIMIT 1) AS BIGINT)
        |    AS top_est
        |FROM j, bnd""".stripMargin,

    "q422_hll_scratch" ->
      """WITH h AS (SELECT l_orderkey AS k,
        |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS hv
        |  FROM lineitem),
        |hr AS (SELECT k, hv // 4503599627370496 AS b,
        |    hv % 4503599627370496 AS rem FROM h),
        |rk AS (SELECT k, b, CASE WHEN rem = 0 THEN 53
        |    ELSE 53 - length(printf('%b', rem)) END AS rank FROM hr),
        |regs AS (SELECT b, MAX(rank) AS m_j FROM rk GROUP BY b),
        |spine AS (SELECT UNNEST(range(0, 256)) AS b),
        |full0 AS (SELECT s.b, COALESCE(r.m_j, 0) AS m_j
        |          FROM spine s LEFT JOIN regs r ON s.b = r.b),
        |ex AS (SELECT COUNT(DISTINCT k) AS n_exact FROM h),
        |ag AS (SELECT SUM(1::BIGINT << (53 - m_j)) AS den,
        |    SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS n_zero_regs,
        |    MAX(m_j) AS max_rank FROM full0)
        |SELECT CAST(ex.n_exact AS BIGINT) AS n_exact,
        |  CAST(CAST(718273 AS HUGEINT) * 256 * 256 * 9007199254740992
        |    // (CAST(ag.den AS HUGEINT) * 1000000) AS BIGINT) AS est,
        |  CAST((CAST(718273 AS HUGEINT) * 256 * 256 * 9007199254740992
        |    // (CAST(ag.den AS HUGEINT) * 1000000) - ex.n_exact) * 10000
        |    // ex.n_exact AS BIGINT) AS err_e4,
        |  CAST(ag.n_zero_regs AS BIGINT) AS n_zero_regs,
        |  CAST(ag.max_rank AS BIGINT) AS max_rank
        |FROM ag, ex""".stripMargin,

    "q423_croston_sba" ->
      """WITH RECURSIVE dd AS (SELECT l_partkey AS p,
        |    CAST(l_shipdate AS DATE) AS d,
        |    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
        |  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
        |span AS (SELECT MIN(d) AS d0,
        |    date_diff('day', MIN(d), MAX(d)) AS sp FROM dd),
        |days AS (SELECT p, date_diff('day', d0, d) AS i, q,
        |    sp * 8 // 10 AS cut, sp FROM dd, span),
        |tr0 AS (SELECT p, i, q,
        |    ROW_NUMBER() OVER (PARTITION BY p ORDER BY i) AS rn
        |  FROM days WHERE i < cut),
        |nd AS (SELECT p, COUNT(*) AS n_demands, SUM(q) AS s_train
        |       FROM tr0 GROUP BY p HAVING COUNT(*) >= 3),
        |rec AS (
        |  SELECT t.p, t.rn, t.q * 1000 AS z, CAST(-1 AS BIGINT) AS v,
        |    t.i AS last, 1::BIGINT AS seen
        |  FROM tr0 t JOIN nd ON t.p = nd.p WHERE t.rn = 1
        |  UNION ALL
        |  SELECT t.p, t.rn,
        |    r.z + (t.q * 1000 - r.z) // 8,
        |    CASE WHEN r.seen = 1 THEN (t.i - r.last) * 1000
        |         ELSE r.v + ((t.i - r.last) * 1000 - r.v) // 8 END,
        |    t.i, r.seen + 1
        |  FROM rec r JOIN tr0 t ON t.p = r.p AND t.rn = r.rn + 1),
        |st AS (SELECT rec.p, rec.z, rec.v FROM rec
        |       JOIN nd ON rec.p = nd.p WHERE rec.rn = nd.n_demands),
        |hold AS (SELECT p, SUM(q) AS a_hold FROM days WHERE i >= cut
        |         GROUP BY p),
        |cutv AS (SELECT sp * 8 // 10 AS cut, sp FROM span),
        |sc AS (SELECT st.p, st.z, st.v, nd.s_train,
        |    COALESCE(h.a_hold, 0) AS a_hold, cutv.cut,
        |    cutv.sp - cutv.cut + 1 AS h_days
        |  FROM st JOIN nd ON st.p = nd.p
        |    LEFT JOIN hold h ON st.p = h.p, cutv),
        |er AS (SELECT p,
        |    ABS(z * 937500 // v - a_hold * 1000000 // h_days) AS err_c,
        |    ABS(s_train * 1000000 // cut - a_hold * 1000000 // h_days)
        |      AS err_n
        |  FROM sc)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(err_c) AS BIGINT) AS err_croston_sum_e6,
        |  CAST(SUM(err_n) AS BIGINT) AS err_naive_sum_e6,
        |  CAST(SUM(CASE WHEN err_c < err_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS croston_wins,
        |  CAST(SUM(CASE WHEN err_c > err_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS naive_wins,
        |  CAST(SUM(err_c) * 10000 // SUM(err_n) AS BIGINT) AS err_ratio_e4
        |FROM er""".stripMargin,

    "q424_cvm_drift" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
        |         THEN 1 ELSE 0 END AS isa FROM orders),
        |cum AS (SELECT isa,
        |    SUM(1 - isa) OVER (ORDER BY v, k
        |      ROWS UNBOUNDED PRECEDING) AS cumb,
        |    SUM(isa) OVER (ORDER BY v, k
        |      ROWS UNBOUNDED PRECEDING) AS cuma
        |  FROM base),
        |ag AS (SELECT SUM(isa) AS n, SUM(1 - isa) AS m,
        |    SUM(CASE WHEN isa = 1 THEN cumb * cumb ELSE 0 END) AS sa2,
        |    SUM(CASE WHEN isa = 0 THEN cuma * cuma ELSE 0 END) AS sb2
        |  FROM cum)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |  CAST(sa2 AS BIGINT) AS sa2, CAST(sb2 AS BIGINT) AS sb2,
        |  CAST((CAST(n AS HUGEINT) * sa2 + CAST(m AS HUGEINT) * sb2)
        |    * 1000000 // (CAST(n AS HUGEINT) * m * (n + m))
        |    - (4 * CAST(n AS HUGEINT) * m - 1) * 1000000
        |      // (6 * (CAST(n AS HUGEINT) + m)) AS BIGINT) AS t_e6,
        |  CAST(CASE WHEN (CAST(n AS HUGEINT) * sa2 + CAST(m AS HUGEINT) * sb2)
        |    * 1000000 // (CAST(n AS HUGEINT) * m * (n + m))
        |    - (4 * CAST(n AS HUGEINT) * m - 1) * 1000000
        |      // (6 * (CAST(n AS HUGEINT) + m)) > 461000
        |    THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
        |FROM ag""".stripMargin
  )
}
