package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduling-and-routing wave (round 10, eighty-seventh wave): SJF
  * optimality census, Chord finger routing.
  *
  * q494 certifies the exchange-argument theorem behind every
  * shortest-job-first scheduler on real daily batches: each day's
  * orders are jobs whose service time is the line-item count, and the
  * total completion time Σ(n−i+1)·s_i is computed under three orders
  * — SJF (ascending), the FIFO arrival order, LJF (descending). SJF
  * ≤ FIFO ≤ LJF is counted per day at zero violations (SJF minimizes
  * and LJF maximizes mean completion time over all permutations), and
  * the aggregate speedup is priced exactly. q495 routes 128
  * hash-sampled keys through a 32-node Chord ring (2⁶⁰ id space,
  * positions and key ids from md5_60): at each hop the next node is
  * the farthest finger successor(cur + 2ʲ) that still PRECEDES the
  * key on the ring. Two distinct claims get distinct treatment: the
  * DETERMINISTIC invariant — every hop strictly shrinks the ring
  * distance (next ∈ (cur, key], so routing must terminate) — is
  * certified at zero violations, while the textbook per-hop halving
  * is only a with-high-probability statement and the data says so:
  * with 32 nodes on a 2⁶⁰ ring the chosen finger often overshoots
  * into a gap, so the halving SHARE is measured per hop bucket, not
  * asserted (the first draft asserted it; the data refuted it —
  * exactly what certificate columns are for). Every key is further
  * certified to land on the true owner, the successor of its id,
  * within 12 hops (observed ≤ 6 ≈ log₂ 32 + 1). Node positions ride along as a 32-element array (the
  * scale story: the ring metadata is node-count-sized, never
  * corpus-sized), and all ring arithmetic is exact pmod, mirrored as
  * ((x % M) + M) % M in the oracle.
  */
object RoutingQueries {

  private val M = 1L << 60
  private val Nodes = 32
  private val Keys = 128
  private val MaxHops = 12

  // 2^j for j ∈ [0, 59] as a pinned CASE (dialect-free literals)
  private def pow2(j: String): String =
    "(case " + (0 to 59).map(k => s"when $j = $k then ${1L << k}").mkString(" ") +
      " end)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G439: SJF exchange-argument census ─────────────────────────────
    "q494_sjf_census" -> ((s, dir) => {
      val jobs = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy(expr("cast(o_orderdate as date)").as("d"),
          col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("sz"))
      // Σ(n−i+1)·s_i along an ordering = fold carrying (remaining, cost)
      def cost(arr: String) =
        s"""aggregate($arr, named_struct('rem', cast(size($arr) as bigint),
           |  'c', 0L),
           |  (acc, v) -> named_struct('rem', acc.rem - 1L,
           |    'c', acc.c + acc.rem * v), f -> f.c)""".stripMargin
      val perDay = jobs.groupBy("d")
        .agg(expr("transform(array_sort(collect_list(struct(k, sz))), " +
          "x -> x.sz)").as("fifo"),
          expr("array_sort(collect_list(sz))").as("sjf"),
          count(lit(1)).as("n"))
        .withColumn("ljf", expr("reverse(sjf)"))
        .select(col("d"), col("n"),
          expr(cost("sjf")).as("c_sjf"),
          expr(cost("fifo")).as("c_fifo"),
          expr(cost("ljf")).as("c_ljf"))
        .withColumn("viol", expr(
          "case when c_sjf <= c_fifo and c_fifo <= c_ljf then 0L else 1L end"))
      perDay.agg(count(lit(1)).as("n_days"), sum("n").as("n_jobs"),
          sum("c_sjf").as("cost_sjf_total"),
          sum("c_fifo").as("cost_fifo_total"),
          sum("c_ljf").as("cost_ljf_total"),
          sum("viol").as("n_violations"),
          expr("bit_xor(md5_60(concat(cast(d as string), ':', " +
            "cast(c_sjf as string))))").as("xor60_costs"))
        .withColumn("sjf_vs_fifo_e4", expr(
          "cost_sjf_total * 10000 div cost_fifo_total"))
        .select("n_days", "n_jobs", "cost_sjf_total", "cost_fifo_total",
          "cost_ljf_total", "sjf_vs_fifo_e4", "n_violations", "xor60_costs")
    }),

    // ── G440: Chord routing with the distance-halving lemma ────────────
    "q495_chord_routing" -> ((s, dir) => {
      // the ring metadata: one sorted 32-position array, node-count-sized
      val ring0 = Tables.orders(s, dir).sparkSession.range(0, Nodes)
        .agg(expr("array_sort(collect_list(" +
          s"pmod(md5_60(concat('node:', cast(id as string))), ${M}L)))")
          .as("arr"))
      def succ(x: String) =
        s"coalesce(array_min(filter(arr, p -> p > $x)), element_at(arr, 1))"
      def dist(a: String, b: String) = s"pmod(($b) - ($a), ${M}L)"
      // Chord's actual data structure: each node's FINGER TABLE,
      // computed once (Nodes × 61 succ scans on the one ring row)
      // instead of once per (key, hop, finger) — the route fold below
      // only reads array slots. fing[n][1] is n's plain ring successor;
      // fing[n][1 + j + 1] = succ(n + 2^j). Routing decisions (hence
      // hashes) are unchanged: these are the same successor values the
      // fold used to recompute inline, where they cost ~60 interpreted
      // 32-element filter scans per hop per key (8.2 s at sf0.1 for
      // ~1.3k keys; the fold is HOF-interpreted, never codegen'd).
      val ring = ring0.withColumn("fing", expr(
        s"""transform(arr, n -> concat(array(${succ("n")}),
           |  transform(sequence(0, 59),
           |    j -> ${succ(s"pmod(n + ${pow2("j")}, ${M}L)")})))""".stripMargin))
      val keys = Tables.orders(s, dir)
        .filter(expr(s"pmod(md5_60(concat('pick:', cast(o_orderkey as string)))," +
          s" ${15000 / Keys}) = 0"))
        .select(col("o_orderkey").as("k"),
          expr(s"pmod(md5_60(concat('kid:', cast(o_orderkey as string))), ${M}L)")
            .as("kid"),
          expr(s"pmod(md5_60(concat('start:', cast(o_orderkey as string))), " +
            s"${Nodes}L)").as("si"))
      // best next hop: the farthest finger successor(cur + 2^j) that
      // still precedes the key (max ring distance from cur, ≤ dist to
      // key) — read from the precomputed table slice fg[2..61]
      val cand = s"""(array_max(transform(filter(slice(fg, 2, 60),
           |  c -> ${dist("acc.cur", "c")} <= ${dist("acc.cur", "kid")}
           |    and c != acc.cur),
           |  c -> named_struct('dd', ${dist("acc.cur", "c")}, 'c', c)))).c"""
        .stripMargin
      val routed = keys.crossJoin(broadcast(ring))
        .withColumn("owner", expr(succ("kid")))
        .withColumn("st", expr(
          s"""aggregate(sequence(1, $MaxHops),
             |  named_struct('cur', element_at(arr, cast(si + 1 as int)),
             |    'hops', 0L, 'done', 0L, 'prog', 0L, 'hv', 0L),
             |  (acc, z) -> case
             |    when acc.done = 1L then acc
             |    else element_at(transform(array(element_at(fing,
             |        cast(array_position(arr, acc.cur) as int))), fg -> case
             |    when ${dist("acc.cur", "kid")} <=
             |        ${dist("acc.cur", "element_at(fg, 1)")}
             |      then named_struct('cur', element_at(fg, 1),
             |        'hops', acc.hops + 1L, 'done', 1L, 'prog', acc.prog,
             |        'hv', acc.hv)
             |    else element_at(transform(array($cand),
             |      nx -> named_struct('cur', nx, 'hops', acc.hops + 1L,
             |        'done', 0L,
             |        'prog', acc.prog + (case when ${dist("nx", "kid")} <
             |          ${dist("acc.cur", "kid")} then 0L else 1L end),
             |        'hv', acc.hv + (case when
             |          2 * ${dist("nx", "kid")} < ${dist("acc.cur", "kid")}
             |          then 1L else 0L end))), 1)
             |    end), 1)
             |    end)""".stripMargin))
        .select(col("k"), col("owner"),
          expr("st.cur").as("landed"), expr("st.hops").as("hops"),
          expr("st.done").as("done"), expr("st.prog").as("prog"),
          expr("st.hv").as("hv"))
      routed.groupBy("hops")
        .agg(count(lit(1)).as("n_keys"),
          sum(expr("case when done = 1L and landed = owner then 1L " +
            "else 0L end")).as("n_resolved_to_owner"),
          sum("prog").as("n_progress_violations"),
          sum("hv").as("n_halved_hops"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(landed as string))))").as("xor60_routes"))
        .orderBy("hops")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q494_sjf_census" ->
      """WITH RECURSIVE jobs AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    o_orderkey AS k, COUNT(*) AS sz
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |seqs AS (SELECT d, sz,
        |    ROW_NUMBER() OVER (PARTITION BY d ORDER BY k) AS fi,
        |    ROW_NUMBER() OVER (PARTITION BY d ORDER BY sz, k) AS si,
        |    ROW_NUMBER() OVER (PARTITION BY d ORDER BY sz DESC, k DESC) AS li,
        |    COUNT(*) OVER (PARTITION BY d) AS n
        |  FROM jobs),
        |costs AS (SELECT d, MIN(n) AS n,
        |    SUM((n - si + 1) * sz) AS c_sjf,
        |    SUM((n - fi + 1) * sz) AS c_fifo,
        |    SUM((n - li + 1) * sz) AS c_ljf
        |  FROM seqs GROUP BY d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(n) AS BIGINT) AS n_jobs,
        |  CAST(SUM(c_sjf) AS BIGINT) AS cost_sjf_total,
        |  CAST(SUM(c_fifo) AS BIGINT) AS cost_fifo_total,
        |  CAST(SUM(c_ljf) AS BIGINT) AS cost_ljf_total,
        |  CAST(SUM(c_sjf) * 10000 // SUM(c_fifo) AS BIGINT) AS sjf_vs_fifo_e4,
        |  CAST(SUM(CASE WHEN c_sjf <= c_fifo AND c_fifo <= c_ljf
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' ||
        |    CAST(c_sjf AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_costs
        |FROM costs""".stripMargin,

    "q495_chord_routing" -> {
      def md(x: String) = s"((($x) % $M + $M) % $M)"
      def succ(x: String) =
        s"COALESCE(list_min(list_filter(arr, p -> p > ($x))), arr[1])"
      def dist(a: String, b: String) = md(s"($b) - ($a)")
      val pow2D = "(CASE " + (0 to 59).map(k =>
        s"WHEN j = $k THEN ${1L << k}").mkString(" ") + " END)"
      // mirror of the Spark side's precomputed finger table: fg[cur][1]
      // = ring successor, fg[cur][1+j+1] = succ(cur + 2^j); the
      // recursion only reads list slots (MATERIALIZED so the 32×61
      // succ scans run once, not once per recursion step)
      def fgAt = s"(fing[CAST(list_position(arr, r.cur) AS INT)])"
      val cand = s"(list_max(list_transform(list_filter(" +
        s"$fgAt[2:61], " +
        s"c -> ${dist("r.cur", "c")} <= ${dist("r.cur", "s.kid")} " +
        s"AND c != r.cur), c -> {'dd': ${dist("r.cur", "c")}, 'c': c}))).c"
      s"""WITH RECURSIVE ring0 AS (SELECT list_sort(list(
        |    ${md(s"CAST('0x' || substr(md5('node:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)")}))
        |    AS arr
        |  FROM (SELECT UNNEST(range(0, $Nodes)) AS i)),
        |ring AS MATERIALIZED (SELECT arr, list_transform(arr, n ->
        |    list_prepend(${succ("n")}, list_transform(range(0, 60),
        |      j -> ${succ(md(s"n + $pow2D"))}))) AS fing
        |  FROM ring0),
        |keys AS (SELECT o_orderkey AS k,
        |    ${md(s"CAST('0x' || substr(md5('kid:' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)")}
        |      AS kid,
        |    CAST('0x' || substr(md5('start:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % $Nodes AS si
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('pick:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % ${15000 / Keys} = 0),
        |rec AS (
        |  SELECT s.k, s.kid, 0::BIGINT AS i,
        |    arr[CAST(s.si + 1 AS INT)] AS cur,
        |    0::BIGINT AS hops, 0::BIGINT AS done, 0::BIGINT AS prog,
        |    0::BIGINT AS hv
        |  FROM keys s, ring
        |  UNION ALL
        |  SELECT z.k, z.kid, z.i, z.ncur, z.nhops, z.ndone, z.nprog, z.nhv
        |  FROM (
        |    SELECT s.k, s.kid, r.i + 1 AS i,
        |      CASE WHEN r.done = 1 THEN r.cur
        |        WHEN ${dist("r.cur", "s.kid")} <=
        |          ${dist("r.cur", s"$fgAt[1]")} THEN $fgAt[1]
        |        ELSE $cand END AS ncur,
        |      CASE WHEN r.done = 1 THEN r.hops ELSE r.hops + 1 END AS nhops,
        |      CASE WHEN r.done = 1 THEN 1
        |        WHEN ${dist("r.cur", "s.kid")} <=
        |          ${dist("r.cur", s"$fgAt[1]")} THEN 1 ELSE 0 END AS ndone,
        |      CASE WHEN r.done = 1 THEN r.prog
        |        WHEN ${dist("r.cur", "s.kid")} <=
        |          ${dist("r.cur", s"$fgAt[1]")} THEN r.prog
        |        ELSE r.prog + (CASE WHEN
        |          ${dist(s"($cand)", "s.kid")} < ${dist("r.cur", "s.kid")}
        |          THEN 0 ELSE 1 END) END AS nprog,
        |      CASE WHEN r.done = 1 THEN r.hv
        |        WHEN ${dist("r.cur", "s.kid")} <=
        |          ${dist("r.cur", s"$fgAt[1]")} THEN r.hv
        |        ELSE r.hv + (CASE WHEN
        |          2 * ${dist(s"($cand)", "s.kid")} < ${dist("r.cur", "s.kid")}
        |          THEN 1 ELSE 0 END) END AS nhv
        |    FROM rec r JOIN keys s ON s.k = r.k, ring
        |    WHERE r.i < $MaxHops) z),
        |fin AS (SELECT r.k, r.kid, r.cur AS landed, r.hops, r.done, r.prog,
        |    r.hv, ${succ("r.kid")} AS owner
        |  FROM rec r, ring WHERE r.i = $MaxHops)
        |SELECT CAST(hops AS BIGINT) AS hops,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN done = 1 AND landed = owner THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_resolved_to_owner,
        |  CAST(SUM(prog) AS BIGINT) AS n_progress_violations,
        |  CAST(SUM(hv) AS BIGINT) AS n_halved_hops,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(landed AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_routes
        |FROM fin GROUP BY hops ORDER BY hops""".stripMargin
    }
  )
}
