package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-theory and online-learning wave (round 10, eighty-second
  * wave): Erdős–Szekeres sortedness profile, weighted-majority
  * experts, Elias–Fano posting economics.
  *
  * q480 profiles how sorted each customer's order-value stream
  * arrives — the quantity that decides q479's initial run count. One
  * fold carries (prev, runs, LIS tails, LDS tails): runs is the
  * natural-merge run count, LIS (non-decreasing) and LDS (strictly
  * decreasing) come from patience-sorting tails where the replace
  * position is just 1 + count(tails ⋖ v) because tails stay sorted —
  * no binary search needed in a fold. Two exact theorems are then
  * COUNTED, not cited: Erdős–Szekeres (LIS·LDS ≥ n, zero violations)
  * and the pigeonhole run bound (LIS ≥ ⌈n/runs⌉, zero violations).
  * q481 replays Littlestone–Warmuth weighted majority over the daily
  * order-volume direction: five deterministic experts (always-up,
  * always-down, momentum, mean-reversion, weekday), multiplicative
  * 3/4 penalty in scaled integers with a documented floor-at-1 (the
  * exact-arithmetic stand-in for renormalization; it only ever makes
  * the majority noisier, never hides mistakes), and the
  * mistake-bound M ≲ 2.5·m_best + 2ln5/η certified in the spec. q482
  * completes q330's posting economics with Elias–Fano: EF size is
  * value-oblivious — n·l + n + (U >> l) bits at l = ⌊log₂(U/n)⌋ — so
  * the same top posting lists get exact EF, bitmap (U bits), and the
  * measured varint-gap bytes side by side, with the ≤ 2 + ⌈log₂(U/n)⌉
  * bits-per-element EF guarantee certified per term.
  */
object OrderTheoryQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G425: Erdős–Szekeres sortedness profile ────────────────────────
    "q480_sortedness" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
          expr("cast(o_orderdate as date)").as("d"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"))
      // pos = 1 + |{t in tails : t "below" v}| — tails are sorted, so
      // the patience replace point needs no search; nondec LIS uses
      // t <= v (replace first strictly-greater), strict LDS runs the
      // strict-LIS recurrence on negated values (t < -v)
      val pos1 = "(size(filter(acc.t1, x -> x <= z.v)) + 1)"
      val pos2 = "(size(filter(acc.t2, x -> x < -z.v)) + 1)"
      def upd(tails: String, pos: String, v: String): String =
        s"""case when $pos > size($tails) then concat($tails, array($v))
           |  else transform(sequence(1, size($tails)),
           |    i -> case when i = $pos then $v
           |              else element_at($tails, i) end) end""".stripMargin
      val perCust = o.groupBy("c")
        .agg(expr("array_sort(collect_list(struct(d, k, v)))").as("xs"),
          count(lit(1)).as("n"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('prev', -1L, 'runs', 0L,
             |    't1', cast(array() as array<bigint>),
             |    't2', cast(array() as array<bigint>)),
             |  (acc, z) -> named_struct(
             |    'prev', z.v,
             |    'runs', acc.runs + (case when acc.prev = -1L or z.v < acc.prev
             |      then 1L else 0L end),
             |    't1', ${upd("acc.t1", pos1, "z.v")},
             |    't2', ${upd("acc.t2", pos2, "-z.v")}))""".stripMargin))
        .select(col("c"), col("n"), expr("st.runs").as("runs"),
          expr("cast(size(st.t1) as bigint)").as("lis"),
          expr("cast(size(st.t2) as bigint)").as("lds"))
        .withColumn("es_viol", expr(
          "case when lis * lds < n then 1L else 0L end"))
        .withColumn("pigeon_viol", expr(
          "case when lis < (n + runs - 1) div runs then 1L else 0L end"))
      perCust.agg(count(lit(1)).as("n_customers"), sum("n").as("n_orders"),
          sum("runs").as("runs_total"), max("runs").as("runs_max"),
          sum("lis").as("lis_total"), max("lis").as("lis_max"),
          sum("lds").as("lds_total"), max("lds").as("lds_max"),
          sum("es_viol").as("n_es_violations"),
          sum("pigeon_viol").as("n_pigeonhole_violations"),
          expr("bit_xor(md5_60(concat(cast(c as string), ':', " +
            "cast(lis as string), ':', cast(lds as string))))")
            .as("xor60_profiles"))
        .withColumn("mean_runs_e2", expr("runs_total * 100 div n_customers"))
        .select("n_customers", "n_orders", "runs_total", "mean_runs_e2",
          "runs_max", "lis_total", "lis_max", "lds_total", "lds_max",
          "n_es_violations", "n_pigeonhole_violations", "xor60_profiles")
    }),

    // ── G426: weighted-majority experts over daily volume direction ────
    "q481_weighted_majority" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .groupBy(expr("cast(o_orderdate as date)").as("d"))
        .agg(count(lit(1)).as("vol"))
        .select(col("d"), col("vol"),
          // ISO weekday via the corpus-standard anchor arithmetic
          expr("pmod(datediff(d, date '1970-01-05'), 7) + 1").as("dow"))
        .withColumn("pvol", expr(
          "lag(vol, 1) over (order by d)"))
        .withColumn("up", expr("case when vol > pvol then 1L else 0L end"))
        .withColumn("pup", expr("lag(up, 1) over (order by d)"))
        .filter(col("pvol").isNotNull && col("pup").isNotNull)
        .select(col("d"), col("up"),
          lit(1L).as("e1"), lit(0L).as("e2"),
          col("pup").as("e3"), expr("1L - pup").as("e4"),
          expr("case when dow <= 5 then 1L else 0L end").as("e5"))
      val preds = (1 to 5).map(i => s"z.e$i")
      val upW = (1 to 5).map(i =>
        s"element_at(acc.w, $i) * ${preds(i - 1)}").mkString(" + ")
      val totW = (1 to 5).map(i => s"element_at(acc.w, $i)").mkString(" + ")
      val fold =
        s"""aggregate(xs,
           |  named_struct('w', transform(sequence(1, 5), p -> 1000000000000L),
           |    'm', 0L, 'mi', transform(sequence(1, 5), p -> 0L)),
           |  (acc, z) -> element_at(transform(array(
           |      case when 2 * ($upW) >= ($totW) then 1L else 0L end),
           |    g -> named_struct(
           |      'w', array(${(1 to 5).map(i =>
                  s"case when ${preds(i - 1)} != z.up then " +
                  s"greatest(element_at(acc.w, $i) * 3 div 4, 1L) " +
                  s"else element_at(acc.w, $i) end").mkString(", ")}),
           |      'm', acc.m + (case when g != z.up then 1L else 0L end),
           |      'mi', array(${(1 to 5).map(i =>
                  s"element_at(acc.mi, $i) + (case when ${preds(i - 1)} != z.up " +
                  s"then 1L else 0L end)").mkString(", ")}))), 1))""".stripMargin
      val one = days.agg(
          expr("array_sort(collect_list(struct(d, up, e1, e2, e3, e4, e5)))")
            .as("xs"), count(lit(1)).as("n_days"))
        .withColumn("st", expr(fold))
      one.select(explode(expr("sequence(1, 5)")).as("i"),
          col("n_days"), col("st"))
        .select(
          expr("element_at(array('1_always_up', '2_always_down', " +
            "'3_momentum', '4_mean_reversion', '5_weekday'), i)").as("expert"),
          col("n_days"),
          expr("element_at(st.mi, i)").as("mistakes"),
          expr("element_at(st.w, i)").as("final_weight"),
          expr("st.m").as("algo_mistakes"),
          expr("array_min(st.mi)").as("best_expert_mistakes"))
        .withColumn("beats_expert", expr(
          "case when algo_mistakes <= mistakes then 1L else 0L end"))
        .orderBy("expert")
    }),

    // ── G427: Elias–Fano vs bitmap vs varint posting economics ─────────
    "q482_elias_fano" -> ((s, dir) => {
      val post = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("tok"))
      val u = Tables.documents(s, dir)
        .agg((max("doc_id") + 1).as("u_bound"))
      val top = post.groupBy("tok").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok").asc).limit(30)
      // measured varint gap bytes (q330's byte model) on the same lists
      val gaps = post.join(broadcast(top), "tok")
        .withColumn("prev", expr(
          "lag(doc_id, 1) over (partition by tok order by doc_id)"))
        .withColumn("gap", expr(
          "case when prev is null then doc_id else doc_id - prev end"))
        .withColumn("vbytes", expr(
          """case when gap < 128 then 1L when gap < 16384 then 2L
            |     when gap < 2097152 then 3L when gap < 268435456 then 4L
            |     else 5L end""".stripMargin))
        .groupBy("tok").agg(min("df").as("n"), sum("vbytes").as("varint_bytes"))
      val flog2U = "(case " + (40 to 0 by -1).map(k =>
        s"when u_bound div n >= ${1L << k} then ${k}L").mkString(" ") + " end)"
      val shiftU = "(case l " + (0 to 40).map(k =>
        s"when ${k}L then u_bound div ${1L << k}L").mkString(" ") + " end)"
      val pow2l = "(case l " + (0 to 40).map(k =>
        s"when ${k}L then ${1L << k}L").mkString(" ") + " end)"
      gaps.crossJoin(broadcast(u))
        .withColumn("l", expr(flog2U))
        .withColumn("ef_bits", expr(s"n * l + n + $shiftU"))
        .withColumn("bitmap_bits", col("u_bound"))
        .withColumn("varint_bits", expr("varint_bytes * 8"))
        // ⌈log₂(U/n)⌉ = least k with n·2^k ≥ U; the EF guarantee is
        // ≤ 2 + ⌈log₂(U/n)⌉ bits per element
        .withColumn("ceil_l", expr(
          s"case when n * $pow2l >= u_bound then l else l + 1L end"))
        .withColumn("ef_per_elem_ok", expr(
          "case when ef_bits <= n * (2L + ceil_l) then 1L else 0L end"))
        .select(col("tok"), col("n"), col("u_bound"), col("l"), col("ceil_l"),
          col("ef_bits"), col("bitmap_bits"), col("varint_bits"),
          expr("ef_bits * 10000 div bitmap_bits").as("ef_vs_bitmap_e4"),
          expr("ef_bits * 10000 div varint_bits").as("ef_vs_varint_e4"),
          col("ef_per_elem_ok"),
          expr("case when ef_bits <= bitmap_bits then 1L else 0L end")
            .as("ef_beats_bitmap"))
        .orderBy("tok")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q480_sortedness" -> {
      val pos1 = "(len(list_filter(r.t1, x -> x <= s.v)) + 1)"
      val pos2 = "(len(list_filter(r.t2, x -> x < -s.v)) + 1)"
      def upd(tails: String, pos: String, v: String): String =
        s"CASE WHEN $pos > len($tails) THEN list_concat($tails, [$v]) " +
          s"ELSE list_transform(range(1, len($tails) + 1), " +
          s"i -> CASE WHEN i = $pos THEN $v ELSE $tails[i] END) END"
      s"""WITH RECURSIVE o AS (SELECT o_custkey AS c, o_orderkey AS k,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |seq AS (SELECT c, v,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY d, k, v) AS i FROM o),
        |nc AS (SELECT c, COUNT(*) AS n FROM o GROUP BY c),
        |rec AS (
        |  SELECT c, 0::BIGINT AS i, -1::BIGINT AS prev, 0::BIGINT AS runs,
        |    []::BIGINT[] AS t1, []::BIGINT[] AS t2
        |  FROM nc
        |  UNION ALL
        |  SELECT s.c, s.i, s.v,
        |    r.runs + (CASE WHEN r.prev = -1 OR s.v < r.prev THEN 1 ELSE 0 END),
        |    (${upd("r.t1", pos1, "s.v")})::BIGINT[],
        |    (${upd("r.t2", pos2, "-s.v")})::BIGINT[]
        |  FROM rec r JOIN seq s ON s.c = r.c AND s.i = r.i + 1),
        |fin AS (SELECT r.c, nc.n, r.runs,
        |    CAST(len(r.t1) AS BIGINT) AS lis, CAST(len(r.t2) AS BIGINT) AS lds
        |  FROM rec r JOIN nc ON r.c = nc.c WHERE r.i = nc.n)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(runs) AS BIGINT) AS runs_total,
        |  CAST(SUM(runs) * 100 // COUNT(*) AS BIGINT) AS mean_runs_e2,
        |  CAST(MAX(runs) AS BIGINT) AS runs_max,
        |  CAST(SUM(lis) AS BIGINT) AS lis_total,
        |  CAST(MAX(lis) AS BIGINT) AS lis_max,
        |  CAST(SUM(lds) AS BIGINT) AS lds_total,
        |  CAST(MAX(lds) AS BIGINT) AS lds_max,
        |  CAST(SUM(CASE WHEN lis * lds < n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_es_violations,
        |  CAST(SUM(CASE WHEN lis < (n + runs - 1) // runs THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pigeonhole_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(c AS VARCHAR) || ':' ||
        |    CAST(lis AS VARCHAR) || ':' || CAST(lds AS VARCHAR)), 1, 15)
        |    AS BIGINT)) AS xor60_profiles
        |FROM fin""".stripMargin
    },

    "q481_weighted_majority" -> {
      val upW = (1 to 5).map(i => s"r.w[$i] * s.e$i").mkString(" + ")
      val totW = (1 to 5).map(i => s"r.w[$i]").mkString(" + ")
      s"""WITH RECURSIVE vols AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d,
        |    COUNT(*) AS vol,
        |    date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) % 7
        |      + 1 AS dow
        |  FROM orders GROUP BY 1),
        |lagd AS MATERIALIZED (SELECT d, vol, dow,
        |    LAG(vol, 1) OVER (ORDER BY d) AS pvol
        |  FROM vols),
        |upd AS MATERIALIZED (SELECT d, dow, pvol,
        |    CASE WHEN vol > pvol THEN 1 ELSE 0 END AS up,
        |    LAG(CASE WHEN vol > pvol THEN 1 ELSE 0 END, 1) OVER (ORDER BY d)
        |      AS pup
        |  FROM lagd),
        |game AS MATERIALIZED (SELECT d, up, 1 AS e1, 0 AS e2, pup AS e3, 1 - pup AS e4,
        |    CASE WHEN dow <= 5 THEN 1 ELSE 0 END AS e5,
        |    ROW_NUMBER() OVER (ORDER BY d) AS i
        |  FROM upd WHERE pvol IS NOT NULL AND pup IS NOT NULL),
        |nd AS MATERIALIZED (SELECT COUNT(*) AS n_days FROM game),
        |rec AS (
        |  SELECT 0::BIGINT AS i,
        |    list_transform(range(1, 6), p -> 1000000000000)::BIGINT[] AS w,
        |    0::BIGINT AS m, list_transform(range(1, 6), p -> 0)::BIGINT[] AS mi
        |  FROM nd
        |  UNION ALL
        |  SELECT z.i,
        |    [${(1 to 5).map(i =>
             s"CASE WHEN z.e$i != z.up THEN GREATEST(z.w[$i] * 3 // 4, 1) " +
             s"ELSE z.w[$i] END").mkString(", ")}]::BIGINT[],
        |    z.m + (CASE WHEN z.g != z.up THEN 1 ELSE 0 END),
        |    [${(1 to 5).map(i =>
             s"z.mi[$i] + (CASE WHEN z.e$i != z.up THEN 1 ELSE 0 END)")
             .mkString(", ")}]::BIGINT[]
        |  FROM (
        |    SELECT s.i, s.up, s.e1, s.e2, s.e3, s.e4, s.e5, r.w, r.m, r.mi,
        |      CASE WHEN 2 * ($upW) >= ($totW) THEN 1 ELSE 0 END AS g
        |    FROM rec r JOIN game s ON s.i = r.i + 1) z),
        |fin AS (SELECT r.w, r.m, r.mi, nd.n_days FROM rec r, nd
        |        WHERE r.i = nd.n_days)
        |SELECT ['1_always_up', '2_always_down', '3_momentum',
        |    '4_mean_reversion', '5_weekday'][CAST(e.i AS INT)] AS expert,
        |  CAST(f.n_days AS BIGINT) AS n_days,
        |  CAST(f.mi[e.i] AS BIGINT) AS mistakes,
        |  CAST(f.w[e.i] AS BIGINT) AS final_weight,
        |  CAST(f.m AS BIGINT) AS algo_mistakes,
        |  CAST(list_min(f.mi) AS BIGINT) AS best_expert_mistakes,
        |  CAST(CASE WHEN f.m <= f.mi[e.i] THEN 1 ELSE 0 END AS BIGINT)
        |    AS beats_expert
        |FROM fin f, (SELECT UNNEST(range(1, 6)) AS i) e
        |ORDER BY expert""".stripMargin
    },

    "q482_elias_fano" -> {
      val flog2U = "(CASE " + (40 to 0 by -1).map(k =>
        s"WHEN u_bound // n >= ${1L << k} THEN $k").mkString(" ") + " END)"
      val shiftU = "(CASE l " + (0 to 40).map(k =>
        s"WHEN $k THEN u_bound // ${1L << k}").mkString(" ") + " END)"
      val pow2l = "(CASE l " + (0 to 40).map(k =>
        s"WHEN $k THEN ${1L << k}").mkString(" ") + " END)"
      s"""WITH post AS (SELECT doc_id, UNNEST(list_distinct(
        |    regexp_split_to_array(trim(text), '\\s+'))) AS tok
        |  FROM documents),
        |ub AS (SELECT MAX(doc_id) + 1 AS u_bound FROM documents),
        |top AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok
        |        ORDER BY df DESC, tok ASC LIMIT 30),
        |g AS (SELECT p.tok, p.doc_id,
        |    LAG(p.doc_id, 1) OVER (PARTITION BY p.tok ORDER BY p.doc_id)
        |      AS prev
        |  FROM post p JOIN top t ON p.tok = t.tok),
        |vb AS (SELECT tok, COUNT(*) AS n,
        |    SUM(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
        |             WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
        |             ELSE 5 END) AS varint_bytes
        |  FROM (SELECT tok, CASE WHEN prev IS NULL THEN doc_id
        |                         ELSE doc_id - prev END AS gap FROM g)
        |  GROUP BY tok),
        |lf AS (SELECT tok, n, varint_bytes, u_bound, $flog2U AS l
        |       FROM vb, ub),
        |ef AS (SELECT tok, n, u_bound, l, varint_bytes,
        |    n * l + n + $shiftU AS ef_bits,
        |    CASE WHEN n * $pow2l >= u_bound THEN l ELSE l + 1 END AS ceil_l
        |  FROM lf)
        |SELECT tok, CAST(n AS BIGINT) AS n, CAST(u_bound AS BIGINT) AS u_bound,
        |  CAST(l AS BIGINT) AS l, CAST(ceil_l AS BIGINT) AS ceil_l,
        |  CAST(ef_bits AS BIGINT) AS ef_bits,
        |  CAST(u_bound AS BIGINT) AS bitmap_bits,
        |  CAST(varint_bytes * 8 AS BIGINT) AS varint_bits,
        |  CAST(ef_bits * 10000 // u_bound AS BIGINT) AS ef_vs_bitmap_e4,
        |  CAST(ef_bits * 10000 // (varint_bytes * 8) AS BIGINT)
        |    AS ef_vs_varint_e4,
        |  CAST(CASE WHEN ef_bits <= n * (2 + ceil_l) THEN 1 ELSE 0 END
        |    AS BIGINT) AS ef_per_elem_ok,
        |  CAST(CASE WHEN ef_bits <= u_bound THEN 1 ELSE 0 END AS BIGINT)
        |    AS ef_beats_bitmap
        |FROM ef ORDER BY tok""".stripMargin
    }
  )
}
