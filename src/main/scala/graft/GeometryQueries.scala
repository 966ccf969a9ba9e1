package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry-and-streaming-primitives wave (round 10, eighty-fourth
  * wave): convex hulls with exact certificates, Kadane's two
  * derivations, Boyer–Moore majority.
  *
  * q486 builds Andrew's monotone-chain convex hull per nation over
  * (account balance, order count) customer points — in a FOLD, which
  * works because the pop cascade is prefix-decidable: each pop test
  * cross(s[j−1], s[j], p) uses only ORIGINAL stack entries, so the
  * kept length is simply the largest j whose turn is strictly left
  * (one max-filter scan, no loop). All arithmetic is exact integer
  * cross products (|x| ≤ 1e6 cents × counts ⇒ ≪ 2⁶³); the hull is
  * then CERTIFIED, not trusted: every consecutive triple turns left
  * (strict convexity), every input point sits in every edge's left
  * half-plane (zero violations), and the doubled shoelace area is
  * emitted exactly. Degenerate nations (collinear, single-point)
  * fall out of the same algebra. q487 computes the best and worst
  * demeaned sales streak by TWO independent derivations folded in one
  * pass — Kadane's cur/best recurrence and the prefix-minimum
  * identity max_t(P_t − min_{s<t} P_s) — and certifies them equal
  * (q429's two-forms discipline). q488 runs Boyer–Moore majority vote
  * over each customer's order priorities, recounts the candidate
  * (the mandatory second pass), independently recomputes the true
  * majority per customer, and counts the theorem — a majority exists
  * iff the verified BM candidate is it — at zero violations.
  */
object GeometryQueries {

  /** cross(a, b, c) from explicit 1-based indexes into arr (c may be a
    * free point). Index expressions must each be ≥ 1. */
  private def cross3(arr: String, i1: String, i2: String,
                     cx: String, cy: String): String =
    s"((element_at($arr, $i2).x - element_at($arr, $i1).x) * " +
      s"($cy - element_at($arr, $i1).y) - " +
      s"(element_at($arr, $i2).y - element_at($arr, $i1).y) * " +
      s"($cx - element_at($arr, $i1).x))"

  /** One monotone-chain half-hull as a fold over sorted points. The
    * j−1 access is clamped to 1 (cross of a point against itself is 0,
    * never > 0, so the j = 1 lane can't pollute the kept-length max). */
  private def hullFold(xsCol: String): String =
    s"""aggregate($xsCol,
       |  cast(array() as array<struct<x: bigint, y: bigint>>),
       |  (acc, z) -> case when size(acc) = 0 then array(named_struct('x', z.x, 'y', z.y))
       |    else concat(
       |      slice(acc, 1, coalesce(array_max(filter(sequence(1, size(acc)),
       |        j -> j >= 2 and ${cross3("acc", "greatest(j - 1, 1)", "j",
                  "z.x", "z.y")} > 0L)), 1)),
       |      array(named_struct('x', z.x, 'y', z.y))) end)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G431: monotone-chain convex hull, certified per nation ─────────
    "q486_convex_hull" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("ck"),
          col("c_nationkey").cast("bigint").as("nk"),
          expr("cast(round(c_acctbal * 100) as bigint)").as("x"))
      val cnt = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("y"))
      val pts = cust.join(cnt, Seq("ck"), "left")
        .select(col("nk"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
        .distinct()
      val nxt = (i: String, m: String) => s"(pmod($i, $m) + 1)"
      // spreadCompute (both frames): the hull folds and the per-point
      // containment sweep sit on byte-tiny frames AQE coalesces to one
      // task; pin CPU-sized partitioning so nations fold in parallel
      val hulls = graft.ops.Relational.spreadCompute(
        pts.groupBy("nk")
          .agg(expr("array_sort(collect_list(struct(x, y)))").as("xs"),
            count(lit(1)).as("n_points")))
        .withColumn("lo", expr(hullFold("xs")))
        .withColumn("hi", expr(hullFold("reverse(xs)")))
        .withColumn("h", expr(
          """case when size(lo) = 1 then lo
            |  else concat(slice(lo, 1, size(lo) - 1),
            |              slice(hi, 1, size(hi) - 1)) end""".stripMargin))
        .withColumn("m", expr("cast(size(h) as bigint)"))
        .withColumn("convex_ok", expr(
          s"""case when m <= 2 then 1L
             |  when size(filter(sequence(1, cast(m as int)), i ->
             |    ${cross3("h", "i", nxt("i", "cast(m as int)"),
                   s"element_at(h, ${nxt(nxt("i", "cast(m as int)"),
                     "cast(m as int)")}).x",
                   s"element_at(h, ${nxt(nxt("i", "cast(m as int)"),
                     "cast(m as int)")}).y")} <= 0L)) = 0 then 1L
             |  else 0L end""".stripMargin))
        .withColumn("area2", expr(
          s"""case when m <= 2 then 0L
             |  else aggregate(sequence(1, cast(m as int)), 0L, (a, i) ->
             |    a + element_at(h, i).x *
             |        element_at(h, ${nxt("i", "cast(m as int)")}).y
             |      - element_at(h, ${nxt("i", "cast(m as int)")}).x *
             |        element_at(h, i).y) end""".stripMargin))
      val inside = graft.ops.Relational.spreadCompute(pts)
        .join(hulls.select(col("nk"), col("h"), col("m")), "nk")
        .select(col("nk"), expr(
          s"""case when m = 1 then
             |    (case when x = element_at(h, 1).x and y = element_at(h, 1).y
             |     then 0L else 1L end)
             |  else cast(size(filter(sequence(1, cast(m as int)), i ->
             |    ${cross3("h", "i", nxt("i", "cast(m as int)"), "x", "y")} < 0L))
             |    as bigint) end""".stripMargin).as("viol"))
        .groupBy("nk").agg(sum("viol").as("inside_violations"))
      hulls.join(inside, "nk")
        .select(col("nk"), col("n_points"), col("m").as("hull_size"),
          col("area2"), col("convex_ok"), col("inside_violations"),
          expr("case when m <= n_points then 1L else 0L end").as("size_ok"))
        .orderBy("nk")
    }),

    // ── G432: Kadane vs the prefix-minimum identity ────────────────────
    "q487_kadane_streak" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .groupBy(expr("cast(o_orderdate as date)").as("d"))
        .agg(count(lit(1)).as("vol"))
      val one = days.agg(
          expr("array_sort(collect_list(struct(d, vol)))").as("xs"),
          count(lit(1)).as("nd"), sum("vol").as("tot"))
        // demeaned in exact integers: x = vol·D − T (Σx = 0)
        .withColumn("st", expr(
          """aggregate(xs,
            |  named_struct('started', 0L, 'cur', 0L, 'best', 0L,
            |    'wcur', 0L, 'worst', 0L,
            |    'pfx', 0L, 'minpfx', 0L, 'best2', 0L),
            |  (acc, z) -> element_at(transform(array(z.vol * nd - tot),
            |    x -> case when acc.started = 0L then named_struct(
            |        'started', 1L, 'cur', x, 'best', x,
            |        'wcur', x, 'worst', x,
            |        'pfx', x, 'minpfx', least(0L, x), 'best2', x)
            |      else named_struct(
            |        'started', 1L,
            |        'cur', greatest(x, acc.cur + x),
            |        'best', greatest(acc.best, greatest(x, acc.cur + x)),
            |        'wcur', least(x, acc.wcur + x),
            |        'worst', least(acc.worst, least(x, acc.wcur + x)),
            |        'pfx', acc.pfx + x,
            |        'minpfx', least(acc.minpfx, acc.pfx + x),
            |        'best2', greatest(acc.best2, acc.pfx + x - acc.minpfx))
            |      end), 1))""".stripMargin))
      one.select(col("nd").as("n_days"), col("tot").as("total_orders"),
          expr("st.best").as("best_streak_scaled"),
          expr("st.best2").as("best_streak_identity"),
          expr("st.worst").as("worst_streak_scaled"),
          expr("case when st.best = st.best2 then 1L else 0L end")
            .as("ident_ok"),
          expr("case when st.pfx = 0L then 1L else 0L end").as("demean_ok"),
          expr("st.best div nd").as("best_per_day_units"))
    }),

    // ── G433: Boyer–Moore majority with theorem census ─────────────────
    "q488_bm_majority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
          expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("p"))
      val counts = (1 to 5).map(v =>
        s"cast(size(filter(xs, e -> e.p = ${v}L)) as bigint)")
      val trueMaj = "(case " + (1 to 5).map(v =>
        s"when 2 * ${counts(v - 1)} > n then ${v}L").mkString(" ") +
        " else 0L end)"
      val perCust = o.groupBy("c")
        .agg(expr("array_sort(collect_list(struct(k, p)))").as("xs"),
          count(lit(1)).as("n"))
        .withColumn("bm", expr(
          """aggregate(xs,
            |  named_struct('cand', 0L, 'cnt', 0L),
            |  (acc, z) -> case
            |    when acc.cnt = 0L then named_struct('cand', z.p, 'cnt', 1L)
            |    when z.p = acc.cand
            |      then named_struct('cand', acc.cand, 'cnt', acc.cnt + 1L)
            |    else named_struct('cand', acc.cand, 'cnt', acc.cnt - 1L)
            |    end)""".stripMargin))
        .withColumn("recount", expr(
          "cast(size(filter(xs, e -> e.p = bm.cand)) as bigint)"))
        .withColumn("verified", expr(
          "case when 2 * recount > n then bm.cand else 0L end"))
        .withColumn("true_maj", expr(trueMaj))
        .withColumn("theorem_viol", expr(
          "case when verified != true_maj then 1L else 0L end"))
      perCust.groupBy(col("verified").as("majority_val"))
        .agg(count(lit(1)).as("n_customers"), sum("n").as("n_orders"),
          sum("theorem_viol").as("n_theorem_violations"),
          sum(expr("case when verified != 0L then 2 * recount - n else 0L end"))
            .as("margin_total"))
        .orderBy("majority_val")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q486_convex_hull" -> {
      def crossD(arr: String, j: String, cx: String, cy: String): String =
        s"(($arr[$j].x - $arr[GREATEST($j - 1, 1)].x) * " +
          s"($cy - $arr[GREATEST($j - 1, 1)].y) - " +
          s"($arr[$j].y - $arr[GREATEST($j - 1, 1)].y) * " +
          s"($cx - $arr[GREATEST($j - 1, 1)].x))"
      val keepL = s"COALESCE(list_max(list_filter(range(1, len(r.stk) + 1), " +
        s"j -> j >= 2 AND ${crossD("r.stk", "j", "s.x", "s.y")} > 0)), 1)"
      val nxt = (i: String) => s"((($i) % m) + 1)"
      val nxt2 = (i: String) => nxt(nxt(i))
      s"""WITH RECURSIVE cust AS MATERIALIZED (SELECT c_custkey AS ck,
        |    CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
        |  FROM customer),
        |cnt AS MATERIALIZED (SELECT o_custkey AS ck, COUNT(*) AS y FROM orders GROUP BY 1),
        |pts AS MATERIALIZED (SELECT DISTINCT nk, x, COALESCE(y, 0) AS y
        |  FROM cust LEFT JOIN cnt USING (ck)),
        |np AS MATERIALIZED (SELECT nk, COUNT(*) AS n_points FROM pts GROUP BY nk),
        |seq AS MATERIALIZED (SELECT nk, x, y, 0 AS dir,
        |    ROW_NUMBER() OVER (PARTITION BY nk ORDER BY x, y) AS i FROM pts
        |  UNION ALL
        |  SELECT nk, x, y, 1,
        |    ROW_NUMBER() OVER (PARTITION BY nk ORDER BY x DESC, y DESC)
        |  FROM pts),
        |rec AS (
        |  SELECT nk, dir, 0::BIGINT AS i,
        |    []::STRUCT(x BIGINT, y BIGINT)[] AS stk
        |  FROM np, (SELECT UNNEST(range(0, 2)) AS dir) d
        |  UNION ALL
        |  SELECT s.nk, s.dir, s.i,
        |    CASE WHEN len(r.stk) = 0 THEN [{'x': s.x, 'y': s.y}]
        |      ELSE list_concat(r.stk[1:$keepL], [{'x': s.x, 'y': s.y}]) END
        |  FROM rec r JOIN seq s
        |    ON s.nk = r.nk AND s.dir = r.dir AND s.i = r.i + 1),
        |half AS (SELECT r.nk, r.dir, r.stk FROM rec r JOIN np
        |    ON r.nk = np.nk WHERE r.i = np.n_points),
        |hull AS (SELECT lo.nk,
        |    CASE WHEN len(lo.stk) = 1 THEN lo.stk
        |      ELSE list_concat(lo.stk[1:len(lo.stk) - 1],
        |                       hi.stk[1:len(hi.stk) - 1]) END AS h
        |  FROM (SELECT nk, stk FROM half WHERE dir = 0) lo
        |  JOIN (SELECT nk, stk FROM half WHERE dir = 1) hi ON lo.nk = hi.nk),
        |hm AS (SELECT nk, h, CAST(len(h) AS BIGINT) AS m FROM hull),
        |certs AS (SELECT nk, m,
        |    CASE WHEN m <= 2 THEN 1
        |      WHEN len(list_filter(range(1, CAST(m AS INT) + 1), i ->
        |        (h[${nxt("i")}].x - h[i].x) * (h[${nxt2("i")}].y - h[i].y)
        |        - (h[${nxt("i")}].y - h[i].y) * (h[${nxt2("i")}].x - h[i].x)
        |        <= 0)) = 0 THEN 1 ELSE 0 END AS convex_ok,
        |    CASE WHEN m <= 2 THEN 0
        |      ELSE list_sum(list_transform(range(1, CAST(m AS INT) + 1), i ->
        |        h[i].x * h[${nxt("i")}].y - h[${nxt("i")}].x * h[i].y)) END
        |      AS area2
        |  FROM hm),
        |ins AS (SELECT p.nk,
        |    SUM(CASE WHEN hm.m = 1 THEN
        |        (CASE WHEN p.x = hm.h[1].x AND p.y = hm.h[1].y THEN 0 ELSE 1 END)
        |      ELSE len(list_filter(range(1, CAST(hm.m AS INT) + 1), i ->
        |        (hm.h[${nxt("i")}].x - hm.h[i].x) * (p.y - hm.h[i].y)
        |        - (hm.h[${nxt("i")}].y - hm.h[i].y) * (p.x - hm.h[i].x) < 0))
        |      END) AS inside_violations
        |  FROM pts p JOIN (SELECT nk, h, m FROM hm) hm ON p.nk = hm.nk
        |  GROUP BY p.nk)
        |SELECT c.nk, CAST(np.n_points AS BIGINT) AS n_points,
        |  CAST(c.m AS BIGINT) AS hull_size,
        |  CAST(c.area2 AS BIGINT) AS area2,
        |  CAST(c.convex_ok AS BIGINT) AS convex_ok,
        |  CAST(ins.inside_violations AS BIGINT) AS inside_violations,
        |  CAST(CASE WHEN c.m <= np.n_points THEN 1 ELSE 0 END AS BIGINT)
        |    AS size_ok
        |FROM certs c JOIN np ON c.nk = np.nk JOIN ins ON c.nk = ins.nk
        |ORDER BY c.nk""".stripMargin
    },

    "q487_kadane_streak" ->
      """WITH RECURSIVE days AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    COUNT(*) AS vol FROM orders GROUP BY 1),
        |meta AS (SELECT COUNT(*) AS nd, SUM(vol) AS tot FROM days),
        |seq AS (SELECT d, vol, ROW_NUMBER() OVER (ORDER BY d) AS i FROM days),
        |rec AS (
        |  SELECT 0::BIGINT AS i, 0::BIGINT AS started, 0::BIGINT AS cur,
        |    0::BIGINT AS best, 0::BIGINT AS wcur, 0::BIGINT AS worst,
        |    0::BIGINT AS pfx, 0::BIGINT AS minpfx, 0::BIGINT AS best2
        |  UNION ALL
        |  SELECT z.i, 1,
        |    CASE WHEN z.started = 0 THEN z.x ELSE GREATEST(z.x, z.cur + z.x) END,
        |    CASE WHEN z.started = 0 THEN z.x
        |      ELSE GREATEST(z.best, GREATEST(z.x, z.cur + z.x)) END,
        |    CASE WHEN z.started = 0 THEN z.x ELSE LEAST(z.x, z.wcur + z.x) END,
        |    CASE WHEN z.started = 0 THEN z.x
        |      ELSE LEAST(z.worst, LEAST(z.x, z.wcur + z.x)) END,
        |    z.pfx + z.x,
        |    CASE WHEN z.started = 0 THEN LEAST(0, z.x)
        |      ELSE LEAST(z.minpfx, z.pfx + z.x) END,
        |    CASE WHEN z.started = 0 THEN z.x
        |      ELSE GREATEST(z.best2, z.pfx + z.x - z.minpfx) END
        |  FROM (
        |    SELECT s.i AS i, s.vol * m.nd - m.tot AS x, r.started, r.cur,
        |      r.best, r.wcur, r.worst, r.pfx, r.minpfx, r.best2
        |    FROM rec r JOIN seq s ON s.i = r.i + 1, meta m) z),
        |fin AS (SELECT r.* FROM rec r, meta m WHERE r.i = m.nd)
        |SELECT CAST(m.nd AS BIGINT) AS n_days, CAST(m.tot AS BIGINT)
        |    AS total_orders,
        |  CAST(f.best AS BIGINT) AS best_streak_scaled,
        |  CAST(f.best2 AS BIGINT) AS best_streak_identity,
        |  CAST(f.worst AS BIGINT) AS worst_streak_scaled,
        |  CAST(CASE WHEN f.best = f.best2 THEN 1 ELSE 0 END AS BIGINT)
        |    AS ident_ok,
        |  CAST(CASE WHEN f.pfx = 0 THEN 1 ELSE 0 END AS BIGINT) AS demean_ok,
        |  CAST(f.best // m.nd AS BIGINT) AS best_per_day_units
        |FROM fin f, meta m""".stripMargin,

    "q488_bm_majority" ->
      s"""WITH RECURSIVE o AS (SELECT o_custkey AS c, o_orderkey AS k,
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS p
        |  FROM orders),
        |seq AS (SELECT c, p,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY k) AS i FROM o),
        |nc AS (SELECT c, COUNT(*) AS n FROM o GROUP BY c),
        |pc AS (SELECT c, p, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
        |tm AS (SELECT nc.c, nc.n,
        |    COALESCE(MAX(CASE WHEN 2 * pc.cnt > nc.n THEN pc.p END), 0)
        |      AS true_maj
        |  FROM nc LEFT JOIN pc ON nc.c = pc.c GROUP BY nc.c, nc.n),
        |rec AS (
        |  SELECT c, 0::BIGINT AS i, 0::BIGINT AS cand, 0::BIGINT AS cnt
        |  FROM nc
        |  UNION ALL
        |  SELECT s.c, s.i,
        |    CASE WHEN r.cnt = 0 THEN s.p ELSE r.cand END,
        |    CASE WHEN r.cnt = 0 THEN 1
        |         WHEN s.p = r.cand THEN r.cnt + 1 ELSE r.cnt - 1 END
        |  FROM rec r JOIN seq s ON s.c = r.c AND s.i = r.i + 1),
        |fin AS (SELECT r.c, t.n, r.cand,
        |    COALESCE(p2.cnt, 0) AS recount, t.true_maj
        |  FROM rec r JOIN tm t ON r.c = t.c
        |  LEFT JOIN pc p2 ON p2.c = r.c AND p2.p = r.cand
        |  WHERE r.i = t.n),
        |vc AS (SELECT c, n, recount,
        |    CASE WHEN 2 * recount > n THEN cand ELSE 0 END AS verified,
        |    true_maj
        |  FROM fin)
        |SELECT CAST(verified AS BIGINT) AS majority_val,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN verified != true_maj THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_theorem_violations,
        |  CAST(SUM(CASE WHEN verified != 0 THEN 2 * recount - n ELSE 0 END)
        |    AS BIGINT) AS margin_total
        |FROM vc GROUP BY verified ORDER BY majority_val""".stripMargin
  )
}
