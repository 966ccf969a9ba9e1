package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perfection-and-incentives wave (round 10, eighty-fifth wave):
  * interval-graph coloring, second-price truthfulness, k-truss peel.
  *
  * q489 observes the interval-graph perfection theorem on every
  * customer's order intervals ([order date, last ship date]): greedy
  * lowest-free-room coloring along sorted starts uses EXACTLY
  * max-clique many colors, and for interval graphs the max clique is
  * the sweep-line peak concurrency — so two independent folds (a room
  * fold and a ±1 sweep fold) must agree per customer, and the census
  * counts zero disagreements. q490 audits Vickrey second-price
  * auctions built from real line items (each supplier's bid for a
  * part = its cheapest observed unit price, parts with ≥ 2 bidders):
  * the winner pays the runner-up bid, and truthfulness is certified
  * by exact case analysis — a hash-perturbed winner deviation either
  * still wins at the same price or loses its nonnegative margin, and
  * a loser deviating below the winner would pay the old winner's bid
  * and book a certain loss. Both deviation classes counted at zero
  * improvements. q491 peels the MinHash dup graph to its 3-truss
  * (every surviving edge must close ≥ 1 triangle with surviving
  * edges): three bounded peel rounds with support recomputed per
  * round, edge counts monotone by construction, convergence flagged
  * — the density skeleton q183's k-core approximates, on edges.
  */
object AuctionGraphQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G434: interval-graph perfection, per-customer census ───────────
    "q489_interval_coloring" -> ((s, dir) => {
      val spans = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("o_orderkey").as("k"),
          expr("cast(o_orderdate as date)").as("st"))
        .agg(greatest(max(expr("cast(l_shipdate as date)")),
          first(expr("cast(o_orderdate as date)"))).as("en"))
        .select(col("c"), col("k"), expr("datediff(st, date '1990-01-01')")
          .as("s0"), expr("datediff(en, date '1990-01-01')").as("e0"))
      // fold 1: greedy room assignment along sorted starts — rooms
      // carry their last end; the lowest strictly-free room wins
      val roomPos = "(array_min(filter(sequence(1, size(acc)), " +
        "r -> element_at(acc, r) < z.s0)))"
      val perCust = spans.groupBy("c")
        .agg(expr("array_sort(collect_list(struct(s0, k, e0)))").as("xs"),
          count(lit(1)).as("n"))
        .withColumn("rooms", expr(
          s"""aggregate(xs,
             |  cast(array() as array<bigint>),
             |  (acc, z) -> case when size(acc) = 0 then array(z.e0)
             |    when $roomPos is null then concat(acc, array(z.e0))
             |    else transform(sequence(1, size(acc)),
             |      r -> case when r = $roomPos then z.e0
             |                else element_at(acc, r) end) end)""".stripMargin))
        // fold 2: sweep peak over (time, ±1) deltas
        .withColumn("deltas", expr(
          "array_sort(concat(transform(xs, x -> struct(x.s0 as t, 1L as d)), " +
            "transform(xs, x -> struct(x.e0 + 1L as t, -1L as d))))"))
        .withColumn("peak", expr(
          """aggregate(deltas, named_struct('open', 0L, 'pk', 0L),
            |  (acc, z) -> named_struct('open', acc.open + z.d,
            |    'pk', greatest(acc.pk, acc.open + z.d)),
            |  f -> f.pk)""".stripMargin))
        .select(col("c"), col("n"),
          expr("cast(size(rooms) as bigint)").as("colors"), col("peak"))
        .withColumn("viol", expr(
          "case when colors != peak then 1L else 0L end"))
      perCust.agg(count(lit(1)).as("n_customers"), sum("n").as("n_orders"),
          sum("colors").as("colors_total"), max("colors").as("colors_max"),
          sum("peak").as("peak_total"), max("peak").as("peak_max"),
          sum("viol").as("n_perfection_violations"),
          expr("bit_xor(md5_60(concat(cast(c as string), ':', " +
            "cast(colors as string))))").as("xor60_colorings"))
    }),

    // ── G435: Vickrey second-price truthfulness audit ──────────────────
    "q490_vickrey_audit" -> ((s, dir) => {
      val bids = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          expr("cast(round(l_extendedprice * 100) as bigint) " +
            "div cast(l_quantity as bigint)").as("unit"))
        .groupBy("pk", "sk").agg(min("unit").as("bid"))
      val ranked = bids
        .withColumn("rk", expr(
          "row_number() over (partition by pk order by bid, sk)"))
        .filter(col("rk") <= 2)
      val auc = ranked.groupBy("pk")
        .agg(count(lit(1)).as("n_top"),
          max(expr("case when rk = 1 then bid end")).as("b1"),
          max(expr("case when rk = 1 then sk end")).as("w"),
          max(expr("case when rk = 2 then bid end")).as("b2"))
        .filter(col("n_top") === 2)
        // hash-perturbed deviations: winner rebids d1 ∈ [0, 2·b2],
        // loser rebids d2 ∈ [0, b1)
        .withColumn("d1", expr(
          "pmod(md5_60(concat('dev:', cast(pk as string))), 2 * b2 + 1)"))
        .withColumn("u_truth", expr("b2 - b1"))
        .withColumn("u_dev", expr(
          "case when d1 < b2 then b2 - b1 else 0L end"))
        // a loser underbidding the winner pays b1 yet its cost is b2:
        // margin b1 − b2 ≤ 0 always
        .withColumn("loser_dev_margin", expr("b1 - b2"))
      auc.agg(count(lit(1)).as("n_auctions"),
          sum(expr("case when b2 >= b1 then 1L else 0L end"))
            .as("n_payment_ge_bid"),
          sum(expr("case when u_truth >= 0L then 1L else 0L end"))
            .as("n_winner_margin_ok"),
          sum(expr("case when u_dev <= u_truth then 1L else 0L end"))
            .as("n_winner_dev_never_better"),
          sum(expr("case when loser_dev_margin <= 0L then 1L else 0L end"))
            .as("n_loser_dev_never_profitable"),
          sum("b2").as("revenue_cents"),
          sum(expr("b2 - b1")).as("info_rent_cents"),
          expr("bit_xor(md5_60(concat(cast(pk as string), ':', " +
            "cast(w as string))))").as("xor60_winners"))
    }),

    // ── G436: 3-truss peel of the dup graph ────────────────────────────
    "q491_ktruss" -> ((s, dir) => {
      // localCheckpoint per peel round (guide §3.3): the lazy chain
      // inlined round r−1's whole wedge join into round r AND into every
      // census branch — a 548-Exchange plan re-planned every run
      val e0 = FeatureQueries.dupPairsTable(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b")).distinct()
        .localCheckpoint()
      def support(e: DataFrame): DataFrame = {
        // common-neighbor count via the wedge join on the UNDIRECTED
        // closure, then matched back to the (a < b) edge list
        val und = e.select(col("a").as("u"), col("b").as("v"))
          .unionByName(e.select(col("b").as("u"), col("a").as("v")))
        val wedge = und.as("x").join(und.as("y"), col("x.u") === col("y.u"))
          .filter(col("x.v") < col("y.v"))
          .select(col("x.v").as("a"), col("y.v").as("b"))
        e.join(wedge.groupBy("a", "b").agg(count(lit(1)).as("sup")),
            Seq("a", "b"), "left")
          .select(col("a"), col("b"), coalesce(col("sup"), lit(0L)).as("sup"))
      }
      val rounds = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]()
      var cur = e0
      (1 to 3).foreach { r =>
        cur = support(cur).filter(col("sup") >= 1L).select("a", "b")
          .localCheckpoint()
        rounds += ((r, cur))
      }
      val counts = Seq((0, e0)) ++ rounds.toSeq
      counts.map { case (r, df) =>
        df.agg(count(lit(1)).as("n_edges"),
            coalesce(expr("bit_xor(md5_60(concat(cast(a as string), ':', " +
              "cast(b as string))))"), lit(0L)).as("xor60_edges"))
          .select(lit(r.toLong).as("round"), col("n_edges"), col("xor60_edges"))
      }.reduce(_.unionByName(_))
        .withColumn("k", lit(3L))
        .select("round", "k", "n_edges", "xor60_edges")
        .orderBy("round")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q489_interval_coloring" -> {
      val roomPos = "(list_min(list_filter(range(1, len(r.rooms) + 1), " +
        "x -> r.rooms[x] < s.s0)))"
      s"""WITH RECURSIVE spans AS (SELECT o_custkey AS c, o_orderkey AS k,
        |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |      AS s0,
        |    GREATEST(MAX(date_diff('day', DATE '1990-01-01',
        |        CAST(l_shipdate AS DATE))),
        |      date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)))
        |      AS e0
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2, 3),
        |seq AS (SELECT c, s0, e0,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY s0, k, e0) AS i
        |  FROM spans),
        |nc AS (SELECT c, COUNT(*) AS n FROM spans GROUP BY c),
        |rec AS (
        |  SELECT c, 0::BIGINT AS i, []::BIGINT[] AS rooms FROM nc
        |  UNION ALL
        |  SELECT s.c, s.i,
        |    (CASE WHEN len(r.rooms) = 0 THEN [s.e0]
        |      WHEN $roomPos IS NULL THEN list_concat(r.rooms, [s.e0])
        |      ELSE list_transform(range(1, len(r.rooms) + 1),
        |        x -> CASE WHEN x = $roomPos THEN s.e0 ELSE r.rooms[x] END)
        |      END)::BIGINT[]
        |  FROM rec r JOIN seq s ON s.c = r.c AND s.i = r.i + 1),
        |colors AS (SELECT r.c, nc.n, CAST(len(r.rooms) AS BIGINT) AS colors
        |  FROM rec r JOIN nc ON r.c = nc.c WHERE r.i = nc.n),
        |deltas AS (SELECT c, s0 AS t, 1 AS d FROM spans
        |  UNION ALL SELECT c, e0 + 1, -1 FROM spans),
        |curve AS (SELECT c, t,
        |    SUM(d) OVER (PARTITION BY c ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS open
        |  FROM (SELECT c, t, SUM(d) AS d FROM deltas GROUP BY c, t)),
        |peaks AS (SELECT c, MAX(open) AS peak FROM curve GROUP BY c),
        |fin AS (SELECT colors.c, colors.n, colors.colors, peaks.peak
        |  FROM colors JOIN peaks ON colors.c = peaks.c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(n) AS BIGINT) AS n_orders,
        |  CAST(SUM(colors) AS BIGINT) AS colors_total,
        |  CAST(MAX(colors) AS BIGINT) AS colors_max,
        |  CAST(SUM(peak) AS BIGINT) AS peak_total,
        |  CAST(MAX(peak) AS BIGINT) AS peak_max,
        |  CAST(SUM(CASE WHEN colors != peak THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_perfection_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(c AS VARCHAR) || ':' ||
        |    CAST(colors AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_colorings
        |FROM fin""".stripMargin
    },

    "q490_vickrey_audit" ->
      """WITH bids AS (SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT)) AS bid
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (SELECT pk, sk, bid,
        |    ROW_NUMBER() OVER (PARTITION BY pk ORDER BY bid, sk) AS rk
        |  FROM bids),
        |auc AS (SELECT pk,
        |    MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
        |    MAX(CASE WHEN rk = 1 THEN sk END) AS w,
        |    MAX(CASE WHEN rk = 2 THEN bid END) AS b2,
        |    COUNT(*) AS n_top
        |  FROM ranked WHERE rk <= 2 GROUP BY pk),
        |dev AS (SELECT pk, b1, w, b2,
        |    CAST('0x' || substr(md5('dev:' || CAST(pk AS VARCHAR)), 1, 15)
        |      AS BIGINT) % (2 * b2 + 1) AS d1
        |  FROM auc WHERE n_top = 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
        |  CAST(SUM(CASE WHEN b2 >= b1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_payment_ge_bid,
        |  CAST(SUM(CASE WHEN b2 - b1 >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_winner_margin_ok,
        |  CAST(SUM(CASE WHEN (CASE WHEN d1 < b2 THEN b2 - b1 ELSE 0 END)
        |    <= b2 - b1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_winner_dev_never_better,
        |  CAST(SUM(CASE WHEN b1 - b2 <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_loser_dev_never_profitable,
        |  CAST(SUM(b2) AS BIGINT) AS revenue_cents,
        |  CAST(SUM(b2 - b1) AS BIGINT) AS info_rent_cents,
        |  bit_xor(CAST('0x' || substr(md5(CAST(pk AS VARCHAR) || ':' ||
        |    CAST(w AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_winners
        |FROM dev""".stripMargin,

    "q491_ktruss" -> {
      def roundCte(prev: String, cur: String): String =
        s"""$cur AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
           |  JOIN (SELECT x.v AS a, y.v AS b, COUNT(*) AS sup
           |    FROM (SELECT a AS u, b AS v FROM $prev
           |          UNION ALL SELECT b, a FROM $prev) x
           |    JOIN (SELECT a AS u, b AS v FROM $prev
           |          UNION ALL SELECT b, a FROM $prev) y
           |      ON x.u = y.u AND x.v < y.v
           |    GROUP BY 1, 2) s
           |  ON e.a = s.a AND e.b = s.b AND s.sup >= 1)""".stripMargin
      TextQueries.sigCte +
        s""",
        |bands AS MATERIALIZED (SELECT doc_id, 0 AS band_id, b0 AS bucket FROM sigs
        |          UNION ALL SELECT doc_id, 1, b1 FROM sigs),
        |cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM bands x JOIN bands y
        |           ON x.band_id = y.band_id AND x.bucket = y.bucket
        |             AND x.doc_id < y.doc_id),
        |wt AS MATERIALIZED (SELECT doc_id,
        |    list_distinct(${graft.functions.TextFunctions.sqlTokens("text")})
        |      AS ts FROM documents),
        |e0 AS MATERIALIZED (SELECT DISTINCT doc_a AS a, doc_b AS b
        |  FROM cand JOIN wt x ON doc_a = x.doc_id JOIN wt y ON doc_b = y.doc_id
        |  WHERE len(list_intersect(x.ts, y.ts)) * 1000000
        |    // (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts)))
        |    >= 200000),
        |${roundCte("e0", "e1")},
        |${roundCte("e1", "e2")},
        |${roundCte("e2", "e3")}
        |SELECT round, CAST(3 AS BIGINT) AS k, CAST(n_edges AS BIGINT)
        |    AS n_edges, xor60_edges
        |FROM (
        |  ${(0 to 3).map(r =>
             s"SELECT ${r}::BIGINT AS round, (SELECT COUNT(*) FROM e$r) AS n_edges, " +
             s"(SELECT COALESCE(bit_xor(CAST('0x' || substr(md5(CAST(a AS VARCHAR) " +
             s"|| ':' || CAST(b AS VARCHAR)), 1, 15) AS BIGINT)), 0) FROM e$r) AS xor60_edges")
             .mkString("\n|  UNION ALL ")}
        |) ORDER BY round""".stripMargin
    }
  )
}
