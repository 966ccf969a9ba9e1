package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replication-and-secrecy wave (round 10, eighty-third wave): quorum
  * intersection economics, CRDT G-counter convergence, Shamir 2-of-3
  * sharing.
  *
  * q483 prices Gifford's (1979) R/W quorums on real keys across a
  * 5-replica group: each key draws an independent hash order for its
  * write set and its read set, and the full 5×5 (R, W) grid measures
  * how often the two sets happen to be DISJOINT — the stale-read
  * event. The pigeonhole certificate (R + W > N ⟹ zero disjoint
  * pairs, combinatorially impossible) is counted on every key, and
  * the sub-quorum half of the grid gets its measured staleness risk —
  * the availability-vs-consistency table every replicated store
  * prices. q484 observes the CRDT convergence theorem on real events:
  * three replicas each see all of their OWN shard's increments but
  * only a hash-chosen ~3/4 of the others'; G-counter merge is
  * slot-wise max, and the audit counts — not cites — commutativity,
  * associativity, idempotence, and exact convergence (every slot's
  * merged value equals the true total, because the slot owner always
  * saw its own increments). q485 splits every order value into Shamir
  * (1979) 2-of-3 shares over GF(2³¹−1) — y_i = s + a·i mod p with a
  * hash-drawn coefficient — and reconstructs from ALL THREE share
  * pairs via constant Lagrange weights (inv(2) = (p+1)/2 a literal),
  * certifying every pair agrees with the secret; single-share bucket
  * occupancy is reported as the no-leakage sanity, with the
  * pmod-vs-% trap handled by explicit ((x % p) + p) % p mirrors.
  */
object ReplicationQueries {

  private def binom(n: Int, k: Int): Long =
    if (k < 0 || k > n) 0L
    else (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  /** C(5−W, R)·10⁴ / C(5, R) as a pinned 2-D CASE (dialect-free). */
  private def binomTheoryE4(rq: String, wq: String): String =
    "(case " + (for { r <- 1 to 5; w <- 1 to 5 } yield
      s"when $rq = $r and $wq = $w then ${binom(5 - w, r) * 10000 / binom(5, r)}")
      .mkString(" ") + " end)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G428: R/W quorum intersection economics ────────────────────────
    "q483_quorum_grid" -> ((s, dir) => {
      // spread: the ×5 explode + two md5s per row below otherwise run
      // inside the single-row-group scan's one task (guide §2.5)
      val reps = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey").as("k"),
          explode(expr("sequence(1, 5)")).as("r"))
        .withColumn("wh", expr(
          "md5_60(concat('w:', cast(k as string), ':', cast(r as string)))"))
        .withColumn("rh", expr(
          "md5_60(concat('r:', cast(k as string), ':', cast(r as string)))"))
        .withColumn("wrank", expr(
          "row_number() over (partition by k order by wh, r)"))
        .withColumn("rrank", expr(
          "row_number() over (partition by k order by rh, r)"))
      val grid = Tables.orders(s, dir).sparkSession.range(1, 26)
        .select((expr("(id - 1) div 5 + 1")).as("rq"),
          expr("(id - 1) % 5 + 1").as("wq"))
      val perKey = reps.crossJoin(broadcast(grid))
        .groupBy("k", "rq", "wq")
        .agg(max(expr("case when wrank <= wq and rrank <= rq then 1L " +
          "else 0L end")).as("meets"))
      perKey.groupBy("rq", "wq")
        .agg(count(lit(1)).as("n_keys"),
          sum(expr("1L - meets")).as("n_disjoint"))
        .withColumn("disjoint_e4", expr("n_disjoint * 10000 div n_keys"))
        // independent hash orders ⟹ P(disjoint) = C(5−W, R) / C(5, R),
        // exactly 0 above the quorum diagonal
        .withColumn("theory_e4", expr(s"cast(${binomTheoryE4("rq", "wq")} as bigint)"))
        .withColumn("gap_e4", expr("disjoint_e4 - theory_e4"))
        .withColumn("quorum_cert", expr(
          "case when rq + wq > 5 then (case when n_disjoint = 0 " +
            "and theory_e4 = 0 then 1L else 0L end) else 1L end"))
        .select("rq", "wq", "n_keys", "n_disjoint", "disjoint_e4",
          "theory_e4", "gap_e4", "quorum_cert")
        .orderBy("rq", "wq")
    }),

    // ── G429: CRDT G-counter merge algebra, observed ───────────────────
    "q484_crdt_gcounter" -> ((s, dir) => {
      // increment owner = the event's shard; replica i sees owner j's
      // increment iff i = j or the visibility hash says the gossip
      // arrived (~3/4)
      val ev = Tables.events(s, dir)
        .select(col("event_id").as("eid"), col("event_type").as("t"),
          expr("cast(pmod(md5_60(concat('own:', cast(event_id as string))), 3) as int)")
            .as("own"))
      val seen = ev.select(col("eid"), col("t"), col("own"),
          explode(expr("sequence(0, 2)")).as("rep"))
        .withColumn("sees", expr(
          "case when rep = own then 1L else (case when " +
            "pmod(md5_60(concat('seen:', cast(rep as string), ':', " +
            "cast(eid as string))), 4) != 0 then 1L else 0L end) end"))
      // slot value: replica rep's view of owner own's counter, per type
      val views = seen.groupBy("t", "own", "rep")
        .agg(sum("sees").as("v"))
      val wide = views.groupBy("t", "own")
        .agg(sum(expr("case when rep = 0 then v else 0L end")).as("v0"),
          sum(expr("case when rep = 1 then v else 0L end")).as("v1"),
          sum(expr("case when rep = 2 then v else 0L end")).as("v2"),
          sum(expr("case when rep = own then v else 0L end")).as("v_owner"))
      val truth = ev.groupBy("t", "own").agg(count(lit(1)).as("true_n"))
      wide.join(truth, Seq("t", "own"))
        .withColumn("merged", expr("greatest(v0, v1, v2)"))
        .select(col("t"), col("own").cast("bigint").as("own"),
          col("v0"), col("v1"), col("v2"), col("merged"), col("true_n"),
          // merge algebra on this slot: commutative/associative/idempotent
          expr("case when greatest(greatest(v0, v1), v2) = " +
            "greatest(v0, greatest(v1, v2)) then 1L else 0L end").as("assoc_ok"),
          expr("case when greatest(v0, v1) = greatest(v1, v0) then 1L " +
            "else 0L end").as("comm_ok"),
          expr("case when greatest(v0, v0) = v0 then 1L else 0L end")
            .as("idem_ok"),
          // convergence: the owner saw everything, so merged = truth
          expr("case when merged = true_n and v_owner = true_n then 1L " +
            "else 0L end").as("converged"),
          expr("case when v0 <= true_n and v1 <= true_n and v2 <= true_n " +
            "then 1L else 0L end").as("monotone_ok"))
        .orderBy("t", "own")
    }),

    // ── G430: Shamir 2-of-3 secret sharing over GF(2³¹−1) ──────────────
    "q485_shamir" -> ((s, dir) => {
      val p = 2147483647L
      val inv2 = (p + 1) / 2
      val sh = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr(s"pmod(cast(round(o_totalprice * 100) as bigint), ${p}L)")
            .as("sec"),
          expr(s"pmod(md5_60(concat('coef:', cast(o_orderkey as string))), ${p}L)")
            .as("a"))
        .withColumn("y1", expr(s"pmod(sec + a, ${p}L)"))
        .withColumn("y2", expr(s"pmod(sec + 2 * a, ${p}L)"))
        .withColumn("y3", expr(s"pmod(sec + 3 * a, ${p}L)"))
        // Lagrange at x=0 with constant weights: (1,2) → 2y1−y2,
        // (2,3) → 3y2−2y3, (1,3) → (3y1−y3)·inv2
        .withColumn("r12", expr(s"pmod(2 * y1 - y2, ${p}L)"))
        .withColumn("r23", expr(s"pmod(3 * y2 - 2 * y3, ${p}L)"))
        .withColumn("r13", expr(s"pmod(pmod(3 * y1 - y3, ${p}L) * ${inv2}L, ${p}L)"))
        .withColumn("bkt", expr("y1 % 16"))
      val spread = sh.groupBy("bkt").agg(count(lit(1)).as("bn"))
        .agg(max("bn").as("bkt_max"), min("bn").as("bkt_min"))
      sh.agg(count(lit(1)).as("n_keys"),
          sum(expr("case when r12 = sec then 1L else 0L end")).as("n_rec12_ok"),
          sum(expr("case when r23 = sec then 1L else 0L end")).as("n_rec23_ok"),
          sum(expr("case when r13 = sec then 1L else 0L end")).as("n_rec13_ok"),
          sum(expr("case when y1 != sec and y2 != sec then 1L else 0L end"))
            .as("n_shares_differ"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(y1 as string))))").as("xor60_shares"))
        .crossJoin(broadcast(spread))
        .withColumn("bkt_spread_e4", expr(
          "(bkt_max - bkt_min) * 10000 div (n_keys div 16)"))
        .select("n_keys", "n_rec12_ok", "n_rec23_ok", "n_rec13_ok",
          "n_shares_differ", "bkt_max", "bkt_min", "bkt_spread_e4",
          "xor60_shares")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q483_quorum_grid" ->
      s"""WITH reps AS (SELECT o_orderkey AS k, r.r,
        |    CAST('0x' || substr(md5('w:' || CAST(o_orderkey AS VARCHAR) || ':'
        |      || CAST(r.r AS VARCHAR)), 1, 15) AS BIGINT) AS wh,
        |    CAST('0x' || substr(md5('r:' || CAST(o_orderkey AS VARCHAR) || ':'
        |      || CAST(r.r AS VARCHAR)), 1, 15) AS BIGINT) AS rh
        |  FROM orders, (SELECT UNNEST(range(1, 6)) AS r) r),
        |rk AS (SELECT k, r,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY wh, r) AS wrank,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY rh, r) AS rrank
        |  FROM reps),
        |grid AS (SELECT (g - 1) // 5 + 1 AS rq, (g - 1) % 5 + 1 AS wq
        |  FROM (SELECT UNNEST(range(1, 26)) AS g)),
        |pk AS (SELECT rk.k, grid.rq, grid.wq,
        |    MAX(CASE WHEN wrank <= wq AND rrank <= rq THEN 1 ELSE 0 END)
        |      AS meets
        |  FROM rk, grid GROUP BY 1, 2, 3)
        |SELECT CAST(rq AS BIGINT) AS rq, CAST(wq AS BIGINT) AS wq,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(1 - meets) AS BIGINT) AS n_disjoint,
        |  CAST(SUM(1 - meets) * 10000 // COUNT(*) AS BIGINT) AS disjoint_e4,
        |  CAST(${binomTheoryE4("rq", "wq")} AS BIGINT) AS theory_e4,
        |  CAST(SUM(1 - meets) * 10000 // COUNT(*)
        |    - ${binomTheoryE4("rq", "wq")} AS BIGINT) AS gap_e4,
        |  CAST(CASE WHEN rq + wq > 5 THEN
        |      (CASE WHEN SUM(1 - meets) = 0
        |        AND ${binomTheoryE4("rq", "wq")} = 0 THEN 1 ELSE 0 END)
        |    ELSE 1 END AS BIGINT) AS quorum_cert
        |FROM pk GROUP BY rq, wq ORDER BY rq, wq""".stripMargin,

    "q484_crdt_gcounter" ->
      """WITH ev AS (SELECT event_id AS eid, event_type AS t,
        |    CAST(CAST('0x' || substr(md5('own:' || CAST(event_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 3 AS INT) AS own
        |  FROM events),
        |seen AS (SELECT eid, t, own, rep.rep,
        |    CASE WHEN rep.rep = own THEN 1
        |         WHEN CAST('0x' || substr(md5('seen:' ||
        |             CAST(rep.rep AS VARCHAR) || ':' || CAST(eid AS VARCHAR)),
        |           1, 15) AS BIGINT) % 4 != 0 THEN 1 ELSE 0 END AS sees
        |  FROM ev, (SELECT UNNEST(range(0, 3)) AS rep) rep),
        |views AS (SELECT t, own, rep, SUM(sees) AS v
        |  FROM seen GROUP BY 1, 2, 3),
        |wide AS (SELECT t, own,
        |    SUM(CASE WHEN rep = 0 THEN v ELSE 0 END) AS v0,
        |    SUM(CASE WHEN rep = 1 THEN v ELSE 0 END) AS v1,
        |    SUM(CASE WHEN rep = 2 THEN v ELSE 0 END) AS v2,
        |    SUM(CASE WHEN rep = own THEN v ELSE 0 END) AS v_owner
        |  FROM views GROUP BY 1, 2),
        |truth AS (SELECT t, own, COUNT(*) AS true_n FROM ev GROUP BY 1, 2)
        |SELECT w.t, CAST(w.own AS BIGINT) AS own,
        |  CAST(v0 AS BIGINT) AS v0, CAST(v1 AS BIGINT) AS v1,
        |  CAST(v2 AS BIGINT) AS v2,
        |  CAST(GREATEST(v0, v1, v2) AS BIGINT) AS merged,
        |  CAST(true_n AS BIGINT) AS true_n,
        |  CAST(CASE WHEN GREATEST(GREATEST(v0, v1), v2) =
        |    GREATEST(v0, GREATEST(v1, v2)) THEN 1 ELSE 0 END AS BIGINT)
        |    AS assoc_ok,
        |  CAST(CASE WHEN GREATEST(v0, v1) = GREATEST(v1, v0) THEN 1 ELSE 0 END
        |    AS BIGINT) AS comm_ok,
        |  CAST(CASE WHEN GREATEST(v0, v0) = v0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS idem_ok,
        |  CAST(CASE WHEN GREATEST(v0, v1, v2) = true_n AND v_owner = true_n
        |    THEN 1 ELSE 0 END AS BIGINT) AS converged,
        |  CAST(CASE WHEN v0 <= true_n AND v1 <= true_n AND v2 <= true_n
        |    THEN 1 ELSE 0 END AS BIGINT) AS monotone_ok
        |FROM wide w JOIN truth USING (t, own)
        |ORDER BY t, own""".stripMargin,

    "q485_shamir" -> {
      val p = 2147483647L
      val inv2 = (p + 1) / 2
      def md(x: String) = s"((($x) % $p + $p) % $p)"
      s"""WITH sh AS (SELECT o_orderkey AS k,
        |    ${md(s"CAST(ROUND(o_totalprice * 100) AS BIGINT)")} AS sec,
        |    ${md(s"CAST('0x' || substr(md5('coef:' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)")} AS a
        |  FROM orders),
        |ys AS (SELECT k, sec, a,
        |    ${md("sec + a")} AS y1, ${md("sec + 2 * a")} AS y2,
        |    ${md("sec + 3 * a")} AS y3
        |  FROM sh),
        |rc AS (SELECT k, sec, y1, y2, y3,
        |    ${md("2 * y1 - y2")} AS r12,
        |    ${md("3 * y2 - 2 * y3")} AS r23,
        |    ${md(s"${md("3 * y1 - y3")} * $inv2")} AS r13,
        |    y1 % 16 AS bkt
        |  FROM ys),
        |spread AS (SELECT MAX(bn) AS bkt_max, MIN(bn) AS bkt_min
        |  FROM (SELECT bkt, COUNT(*) AS bn FROM rc GROUP BY bkt))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN r12 = sec THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rec12_ok,
        |  CAST(SUM(CASE WHEN r23 = sec THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rec23_ok,
        |  CAST(SUM(CASE WHEN r13 = sec THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rec13_ok,
        |  CAST(SUM(CASE WHEN y1 != sec AND y2 != sec THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shares_differ,
        |  CAST(MAX(bkt_max) AS BIGINT) AS bkt_max,
        |  CAST(MAX(bkt_min) AS BIGINT) AS bkt_min,
        |  CAST((MAX(bkt_max) - MAX(bkt_min)) * 10000
        |    // (COUNT(*) // 16) AS BIGINT) AS bkt_spread_e4,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(y1 AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_shares
        |FROM rc, spread""".stripMargin
    }
  )
}
