package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cuckoo wave (round 10, ninetieth wave): cuckoo hashing at the
  * load threshold.
  *
  * q498 completes the hashing-economics family (one-choice q469,
  * two-choice q475, quorums q483, birthday q496) with Pagh &
  * Rodler's (2001) cuckoo hashing: per shard, the first 36
  * hash-ordered keys insert into two 32-slot tables (load 0.56 —
  * deliberately ABOVE the 2-table threshold of 0.5, so eviction
  * chains and stash overflow actually happen and get measured).
  * Each insert places at T1[h1], evicting any occupant, which then
  * places at the OTHER table's slot, up to 16 kicks; an unplaced
  * leftover goes to the stash. The structure's whole point is then
  * CERTIFIED, not assumed: every inserted key is findable at
  * T1[h1(k)], T2[h2(k)], or the stash (the O(1) worst-case lookup
  * guarantee), and occupied slots + stash exactly conserve the
  * insert count per shard. Shards are the parallel unit (q475's
  * scale shape); the per-shard work is capped at 36×16 placements
  * regardless of corpus size. The oracle replays the identical
  * eviction state machine as a single-branch recursive CTE (one
  * placement per step, new-item steps joined in when no key is
  * carried).
  */
object CuckooQueries {

  private val Slots = 32
  private val Items = 36
  private val Shards = 32
  private val MaxKicks = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G443: cuckoo hashing with eviction chains + stash ──────────────
    "q498_cuckoo" -> ((s, dir) => {
      val keyed = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr(s"pmod(md5_60(concat('cs:', cast(o_orderkey as string))), $Shards)")
            .as("shard"),
          expr("md5_60(concat('co:', cast(o_orderkey as string)))").as("ord"))
        .withColumn("rk", expr(
          "row_number() over (partition by shard order by ord, k)"))
        .filter(col("rk") <= Items)
      def posOf(cur: String, side: String): String =
        s"cast(pmod(md5_60(concat(case when $side = 1 then 'k1:' else 'k2:' end, " +
          s"cast($cur as string))), $Slots) + 1 as int)"
      def setAt(arr: String, pos: String, v: String): String =
        s"transform(sequence(1, $Slots), p -> case when p = $pos then $v " +
          s"else element_at($arr, p) end)"
      val insert =
        s"""aggregate(sequence(1, $MaxKicks),
           |  named_struct('t1', acc.t1, 't2', acc.t2,
           |    'cur', z.k, 'side', 1),
           |  (st, kk) -> case when st.cur = -1L then st
           |    else element_at(transform(array(${posOf("st.cur", "st.side")}),
           |      pos -> case when st.side = 1
           |        then named_struct(
           |          't1', ${setAt("st.t1", "pos", "st.cur")}, 't2', st.t2,
           |          'cur', element_at(st.t1, pos), 'side', 2)
           |        else named_struct(
           |          't1', st.t1, 't2', ${setAt("st.t2", "pos", "st.cur")},
           |          'cur', element_at(st.t2, pos), 'side', 1) end), 1)
           |    end,
           |  q -> named_struct('t1', q.t1, 't2', q.t2,
           |    'stash', case when q.cur != -1L
           |      then concat(acc.stash, array(q.cur)) else acc.stash end))"""
          .stripMargin
      val folded = keyed.groupBy("shard")
        .agg(expr("array_sort(collect_list(struct(ord, k)))").as("xs"),
          count(lit(1)).as("n_ins"))
        .withColumn("st", expr(
          s"""aggregate(xs,
             |  named_struct('t1', transform(sequence(1, $Slots), p -> -1L),
             |    't2', transform(sequence(1, $Slots), p -> -1L),
             |    'stash', cast(array() as array<bigint>)),
             |  (acc, z) -> $insert)""".stripMargin))
        .select(col("shard"), col("n_ins"), col("xs"),
          expr("st.t1").as("t1"), expr("st.t2").as("t2"),
          expr("st.stash").as("stash"))
      val audited = folded.select(col("shard"), col("n_ins"),
          expr("cast(size(filter(t1, v -> v != -1L)) as bigint)").as("occ1"),
          expr("cast(size(filter(t2, v -> v != -1L)) as bigint)").as("occ2"),
          expr("cast(size(stash) as bigint)").as("n_stash"),
          // the O(1)-lookup certificate: every inserted key findable
          expr(
            s"""cast(size(filter(xs, z ->
               |  element_at(t1, ${posOf("z.k", "1")}) = z.k or
               |  element_at(t2, ${posOf("z.k", "2")}) = z.k or
               |  array_contains(stash, z.k))) as bigint)""".stripMargin)
            .as("n_found"))
        .withColumn("conserve_ok", expr(
          "case when occ1 + occ2 + n_stash = n_ins then 1L else 0L end"))
      audited.agg(count(lit(1)).as("n_shards"), sum("n_ins").as("n_items"),
          sum("n_found").as("n_found"),
          sum("n_stash").as("n_stash_total"), max("n_stash").as("stash_max"),
          sum(expr("1L - conserve_ok")).as("n_conserve_violations"),
          sum(expr("occ1 + occ2")).as("slots_occupied"))
        .withColumn("lookup_ok", expr(
          "case when n_found = n_items then 1L else 0L end"))
        .withColumn("load_e4", expr(
          s"slots_occupied * 10000 div (${Slots * 2}L * n_shards)"))
        .select("n_shards", "n_items", "n_found", "lookup_ok",
          "n_stash_total", "stash_max", "n_conserve_violations",
          "slots_occupied", "load_e4")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q498_cuckoo" -> {
      def md(x: String) =
        s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"
      def posOf(cur: String, side: String): String =
        s"CAST(${md(s"(CASE WHEN $side = 1 THEN 'k1:' ELSE 'k2:' END) || CAST($cur AS VARCHAR)")} % $Slots + 1 AS INT)"
      def setAt(arr: String, pos: String, v: String): String =
        s"list_transform(range(1, ${Slots + 1}), p -> CASE WHEN p = $pos " +
          s"THEN $v ELSE $arr[p] END)"
      s"""WITH RECURSIVE keyed AS (SELECT o_orderkey AS k,
        |    ${md(s"'cs:' || CAST(o_orderkey AS VARCHAR)")} % $Shards AS shard,
        |    ${md(s"'co:' || CAST(o_orderkey AS VARCHAR)")} AS ord
        |  FROM orders),
        |seq AS (SELECT shard, k, i FROM (
        |    SELECT shard, k, ord,
        |      ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, k) AS i
        |    FROM keyed) WHERE i <= $Items),
        |ns AS (SELECT shard, COUNT(*) AS n FROM seq GROUP BY shard),
        |rec AS (
        |  SELECT shard, n, 0::BIGINT AS i, -1::BIGINT AS cur, 1::BIGINT AS side,
        |    0::BIGINT AS kicks,
        |    list_transform(range(1, ${Slots + 1}), p -> -1)::BIGINT[] AS t1,
        |    list_transform(range(1, ${Slots + 1}), p -> -1)::BIGINT[] AS t2,
        |    []::BIGINT[] AS stash
        |  FROM ns
        |  UNION ALL
        |  SELECT w.shard, w.n, w.ni,
        |    CASE WHEN w.carried != -1 AND w.nkicks >= $MaxKicks THEN -1
        |         ELSE w.carried END,
        |    CASE WHEN w.carried = -1 OR w.nkicks >= $MaxKicks THEN 1
        |         ELSE 3 - w.aside END,
        |    CASE WHEN w.carried = -1 OR w.nkicks >= $MaxKicks THEN 0
        |         ELSE w.nkicks END,
        |    w.nt1, w.nt2,
        |    CASE WHEN w.carried != -1 AND w.nkicks >= $MaxKicks
        |      THEN list_concat(w.stash, [w.carried]) ELSE w.stash END
        |  FROM (
        |    SELECT z.shard, z.n, z.ni, z.aside, z.nkicks, z.stash,
        |      CASE WHEN z.aside = 1 THEN z.t1[z.pos] ELSE z.t2[z.pos] END
        |        AS carried,
        |      CASE WHEN z.aside = 1 THEN (${setAt("z.t1", "z.pos", "z.active")})::BIGINT[]
        |           ELSE z.t1 END AS nt1,
        |      CASE WHEN z.aside = 2 THEN (${setAt("z.t2", "z.pos", "z.active")})::BIGINT[]
        |           ELSE z.t2 END AS nt2
        |    FROM (
        |      SELECT y.*, ${posOf("y.active", "y.aside")} AS pos
        |      FROM (
        |        SELECT r.shard, r.n,
        |          CASE WHEN r.cur = -1 THEN r.i + 1 ELSE r.i END AS ni,
        |          CASE WHEN r.cur = -1 THEN s.k ELSE r.cur END AS active,
        |          CASE WHEN r.cur = -1 THEN 1 ELSE r.side END AS aside,
        |          CASE WHEN r.cur = -1 THEN 1 ELSE r.kicks + 1 END AS nkicks,
        |          r.t1, r.t2, r.stash
        |        FROM rec r LEFT JOIN seq s
        |          ON s.shard = r.shard AND r.cur = -1 AND s.i = r.i + 1
        |        WHERE NOT (r.cur = -1 AND r.i >= r.n)) y) z) w),
        |fin AS (SELECT r.shard, r.n, r.t1, r.t2, r.stash
        |  FROM rec r WHERE r.cur = -1 AND r.i = r.n),
        |aud AS (SELECT f.shard, f.n,
        |    len(list_filter(f.t1, v -> v != -1)) AS occ1,
        |    len(list_filter(f.t2, v -> v != -1)) AS occ2,
        |    len(f.stash) AS n_stash,
        |    (SELECT COUNT(*) FROM seq s WHERE s.shard = f.shard
        |      AND (f.t1[${posOf("s.k", "1")}] = s.k
        |        OR f.t2[${posOf("s.k", "2")}] = s.k
        |        OR list_contains(f.stash, s.k))) AS n_found
        |  FROM fin f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
        |  CAST(SUM(n) AS BIGINT) AS n_items,
        |  CAST(SUM(n_found) AS BIGINT) AS n_found,
        |  CAST(CASE WHEN SUM(n_found) = SUM(n) THEN 1 ELSE 0 END AS BIGINT)
        |    AS lookup_ok,
        |  CAST(SUM(n_stash) AS BIGINT) AS n_stash_total,
        |  CAST(MAX(n_stash) AS BIGINT) AS stash_max,
        |  CAST(SUM(CASE WHEN occ1 + occ2 + n_stash = n THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_conserve_violations,
        |  CAST(SUM(occ1 + occ2) AS BIGINT) AS slots_occupied,
        |  CAST(SUM(occ1 + occ2) * 10000 // (${Slots * 2} * COUNT(*))
        |    AS BIGINT) AS load_e4
        |FROM aud""".stripMargin
    }
  )
}
