package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contention wave (round 10, ninety-fourth wave): slotted ALOHA,
  * binary exponential backoff.
  *
  * q504 measures Abramson/Roberts slotted ALOHA on ⌊N/8⌋ hash groups
  * (the modulus scales with the corpus so mean occupancy stays 8): at attempt rate p = 1/k each station transmits iff its
  * hash draw lands in the 1/k window, a slot succeeds iff EXACTLY ONE
  * transmits, and the measured success rate sits beside the exact
  * binomial n·(k−1)^(n−1)/k^n at e4 (integer arithmetic — n = 8
  * keeps k^8 ≤ 2.8e14, why the group size is 8). Hash groups are
  * Poisson-sized, so the compare runs on the exactly-8 stratum — the
  * first draft compared all groups and the 488 e-4 gap was size
  * dispersion masquerading as hash bias. The sweep k = 2 → 32
  * reproduces the textbook curve: throughput peaks at p = 1/n and
  * collapses on both sides — the finite-n version of the 1/e law. q505 replays binary exponential
  * backoff — Ethernet's collision resolution — over 20 rounds per
  * group of 16 stations (real order keys, hash-ranked into 64
  * groups): every undelivered station draws a slot in its window
  * [0, w) keyed by its own order key, same-slot draws collide,
  * survivors deliver and leave, colliders double w (cap 64, the cap
  * certified). The fold carries per-station (window, delivered)
  * arrays, and the measured rounds-to-drain distribution and
  * residual undelivered count are reported honestly — BEB does not
  * guarantee drainage in 20 rounds; the table says how often it
  * happened.
  */
object ContentionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G449: slotted ALOHA, measured vs exact binomial ────────────────
    "q504_slotted_aloha" -> ((s, dir) => {
      val ks = Seq(2, 4, 8, 16, 32)
      def theoryE4(k: Int): Long = {
        val n = 8
        val num = 8L * math.pow(k - 1, n - 1).toLong * 10000L
        num / math.pow(k, n).toLong
      }
      val tot = Tables.orders(s, dir).agg(
        expr("greatest(count(1) div 8, 1L)").as("g_mod"))
      val st = Tables.orders(s, dir).crossJoin(broadcast(tot))
        .select(col("o_orderkey").as("key"),
          expr("pmod(md5_60(concat('grp:', cast(o_orderkey as string))), g_mod)")
            .as("grp"),
          explode(expr(s"array(${ks.mkString(", ")})")).as("k"))
        .withColumn("tx", expr(
          "case when pmod(md5_60(concat('tx:', cast(k as string), ':', " +
            "cast(key as string))), k) = 0 then 1L else 0L end"))
      // hash groups are Poisson(8)-sized; the binomial theory assumes
      // EXACTLY n = 8 stations, so the compare runs on the n = 8
      // stratum (~14% of groups) — restricting the sample rather than
      // letting size dispersion masquerade as hash bias
      val grouped = st.groupBy("k", "grp")
        .agg(count(lit(1)).as("n_st"), sum("tx").as("n_tx"))
        .filter(col("n_st") === 8)
        .withColumn("success", expr(
          "case when n_tx = 1 then 1L else 0L end"))
      grouped.groupBy("k")
        .agg(count(lit(1)).as("n_groups"), sum("n_st").as("n_stations"),
          sum("success").as("n_success"),
          sum(expr("case when n_tx = 0 then 1L else 0L end")).as("n_idle"),
          sum(expr("case when n_tx >= 2 then 1L else 0L end"))
            .as("n_collision"))
        .withColumn("measured_e4", expr("n_success * 10000 div n_groups"))
        .withColumn("theory_e4", expr("(case " + ks.map(k =>
          s"when k = $k then ${theoryE4(k)}L").mkString(" ") + " end)"))
        .withColumn("gap_e4", expr("measured_e4 - theory_e4"))
        .withColumn("partition_ok", expr(
          "case when n_success + n_idle + n_collision = n_groups " +
            "then 1L else 0L end"))
        .select(col("k").cast("bigint").as("k"), col("n_groups"),
          col("n_stations"), col("n_success"), col("n_idle"),
          col("n_collision"), col("measured_e4"), col("theory_e4"),
          col("gap_e4"), col("partition_ok"))
        .orderBy("k")
    }),

    // ── G450: binary exponential backoff drain ─────────────────────────
    "q505_exp_backoff" -> ((s, dir) => {
      val n = 16
      val rounds = 20
      // stations are real order keys (16 hash-ranked per group); station
      // p draws slot pmod(md5('bo:round:key'), w_p); equal draws among
      // undelivered stations collide
      val slotOf = "pmod(md5_60(concat('bo:', cast(z as string), ':', " +
        "cast(element_at(ks, p) as string))), element_at(acc.w, p))"
      val fold =
        s"""aggregate(sequence(1, $rounds),
           |  named_struct('w', transform(sequence(1, $n), p -> 2L),
           |    'done', transform(sequence(1, $n), p -> 0L),
           |    'drained_round', 0L, 'collisions', 0L),
           |  (acc, z) -> element_at(transform(array(
           |      transform(sequence(1, $n), p ->
           |        case when element_at(acc.done, p) = 1L then -1L
           |             else $slotOf end)),
           |    slots -> named_struct(
           |      'w', transform(sequence(1, $n), p ->
           |        case when element_at(acc.done, p) = 1L
           |          then element_at(acc.w, p)
           |        when size(filter(slots, x ->
           |            x = element_at(slots, p) and x >= 0L)) > 1
           |          then least(element_at(acc.w, p) * 2L, 64L)
           |        else element_at(acc.w, p) end),
           |      'done', transform(sequence(1, $n), p ->
           |        case when element_at(acc.done, p) = 1L then 1L
           |        when element_at(slots, p) >= 0L and
           |          size(filter(slots, x -> x = element_at(slots, p))) = 1
           |          then 1L
           |        else 0L end),
           |      'drained_round', case when acc.drained_round > 0L
           |          then acc.drained_round
           |        when size(filter(transform(sequence(1, $n), p ->
           |          case when element_at(acc.done, p) = 1L then 1L
           |          when element_at(slots, p) >= 0L and
           |            size(filter(slots, x -> x = element_at(slots, p))) = 1
           |            then 1L else 0L end), d -> d = 0L)) = 0
           |          then z
           |        else 0L end,
           |      'collisions', acc.collisions +
           |        size(filter(slots, x -> x >= 0L and
           |          size(filter(slots, y -> y = x)) > 1)))), 1))""".stripMargin
      val groups = Tables.orders(s, dir)
        .select(col("o_orderkey").as("key"),
          expr("pmod(md5_60(concat('bg:', cast(o_orderkey as string))), 64)")
            .as("grp"),
          expr("md5_60(concat('br:', cast(o_orderkey as string)))").as("ord"))
        .withColumn("rk", expr(
          "row_number() over (partition by grp order by ord, key)"))
        .filter(col("rk") <= n)
        .groupBy("grp")
        .agg(expr("transform(array_sort(collect_list(struct(ord, key))), " +
          "x -> x.key)").as("ks"))
        .filter(expr(s"size(ks) = $n"))
        .withColumn("st", expr(fold))
        .select(col("grp"),
          expr("st.drained_round").as("drained_round"),
          expr(s"cast(size(filter(st.done, d -> d = 1L)) as bigint)")
            .as("n_delivered"),
          expr("st.collisions").as("n_collision_events"),
          expr("array_max(st.w)").as("w_max"))
      groups.agg(count(lit(1)).as("n_groups"),
          sum(expr(s"case when n_delivered = ${n}L then 1L else 0L end"))
            .as("n_fully_drained"),
          sum("n_delivered").as("delivered_total"),
          sum(expr("case when drained_round > 0L then drained_round " +
            "else 0L end")).as("drain_rounds_total"),
          max("drained_round").as("drain_round_max"),
          sum("n_collision_events").as("collisions_total"),
          max("w_max").as("w_max_seen"),
          sum(expr("case when w_max <= 64L then 0L else 1L end"))
            .as("n_cap_violations"))
        .withColumn("delivered_e4", expr(
          s"delivered_total * 10000 div (n_groups * ${n}L)"))
        .select("n_groups", "n_fully_drained", "delivered_total",
          "delivered_e4", "drain_rounds_total", "drain_round_max",
          "collisions_total", "w_max_seen", "n_cap_violations")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q504_slotted_aloha" -> {
      val ks = Seq(2, 4, 8, 16, 32)
      def theoryE4(k: Int): Long =
        8L * math.pow(k - 1, 7).toLong * 10000L / math.pow(k, 8).toLong
      s"""WITH st AS (SELECT o_orderkey AS key,
        |    CAST('0x' || substr(md5('grp:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % (SELECT GREATEST(COUNT(*) // 8, 1)
        |        FROM orders) AS grp, k.k,
        |    CASE WHEN CAST('0x' || substr(md5('tx:' || CAST(k.k AS VARCHAR)
        |      || ':' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % k.k
        |      = 0 THEN 1 ELSE 0 END AS tx
        |  FROM orders, (SELECT UNNEST([${ks.mkString(", ")}]) AS k) k),
        |grouped AS (SELECT k, grp, n_st, n_tx FROM (
        |    SELECT k, grp, COUNT(*) AS n_st, SUM(tx) AS n_tx
        |    FROM st GROUP BY 1, 2) WHERE n_st = 8)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(n_st) AS BIGINT) AS n_stations,
        |  CAST(SUM(CASE WHEN n_tx = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_success,
        |  CAST(SUM(CASE WHEN n_tx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_idle,
        |  CAST(SUM(CASE WHEN n_tx >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_collision,
        |  CAST(SUM(CASE WHEN n_tx = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    AS BIGINT) AS measured_e4,
        |  CAST((CASE ${ks.map(k =>
             s"WHEN k = $k THEN ${theoryE4(k)}").mkString(" ")} END)
        |    AS BIGINT) AS theory_e4,
        |  CAST(SUM(CASE WHEN n_tx = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    - (CASE ${ks.map(k =>
             s"WHEN k = $k THEN ${theoryE4(k)}").mkString(" ")} END)
        |    AS BIGINT) AS gap_e4,
        |  CAST(CASE WHEN SUM(CASE WHEN n_tx = 1 THEN 1 ELSE 0 END)
        |    + SUM(CASE WHEN n_tx = 0 THEN 1 ELSE 0 END)
        |    + SUM(CASE WHEN n_tx >= 2 THEN 1 ELSE 0 END) = COUNT(*)
        |    THEN 1 ELSE 0 END AS BIGINT) AS partition_ok
        |FROM grouped GROUP BY k ORDER BY k""".stripMargin
    },

    "q505_exp_backoff" -> {
      val n = 16
      val rounds = 20
      val slotOf = "CASE WHEN r.done[p] = 1 THEN -1 ELSE " +
        "CAST('0x' || substr(md5('bo:' || CAST(r.i + 1 AS VARCHAR) || ':' || " +
        "CAST(r.ks[p] AS VARCHAR)), 1, 15) AS BIGINT) % r.w[p] END"
      s"""WITH RECURSIVE keyed AS (SELECT o_orderkey AS key,
        |    CAST('0x' || substr(md5('bg:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 64 AS grp,
        |    CAST('0x' || substr(md5('br:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS ord
        |  FROM orders),
        |groups AS (SELECT grp, ks FROM (SELECT grp,
        |    list_transform(list_sort(list({'ord': ord, 'key': key})),
        |      x -> x.key) AS ks
        |  FROM (SELECT grp, ord, key FROM (
        |      SELECT grp, ord, key, ROW_NUMBER() OVER (PARTITION BY grp
        |        ORDER BY ord, key) AS rk FROM keyed) WHERE rk <= $n)
        |  GROUP BY grp) WHERE len(ks) = $n),
        |rec AS (
        |  SELECT g.grp, g.ks, 0::BIGINT AS i,
        |    list_transform(range(1, ${n + 1}), p -> 2)::BIGINT[] AS w,
        |    list_transform(range(1, ${n + 1}), p -> 0)::BIGINT[] AS done,
        |    0::BIGINT AS drained_round, 0::BIGINT AS collisions
        |  FROM groups g
        |  UNION ALL
        |  SELECT z.grp, z.ks, z.i,
        |    list_transform(range(1, ${n + 1}), p ->
        |      CASE WHEN z.done[p] = 1 THEN z.w[p]
        |        WHEN len(list_filter(z.slots, x ->
        |            x = z.slots[p] AND x >= 0)) > 1
        |          THEN LEAST(z.w[p] * 2, 64)
        |        ELSE z.w[p] END)::BIGINT[],
        |    list_transform(range(1, ${n + 1}), p ->
        |      CASE WHEN z.done[p] = 1 THEN 1
        |        WHEN z.slots[p] >= 0 AND
        |          len(list_filter(z.slots, x -> x = z.slots[p])) = 1
        |          THEN 1
        |        ELSE 0 END)::BIGINT[],
        |    CASE WHEN z.drained_round > 0 THEN z.drained_round
        |      WHEN len(list_filter(list_transform(range(1, ${n + 1}), p ->
        |        CASE WHEN z.done[p] = 1 THEN 1
        |          WHEN z.slots[p] >= 0 AND
        |            len(list_filter(z.slots, x -> x = z.slots[p])) = 1
        |            THEN 1 ELSE 0 END), d -> d = 0)) = 0
        |        THEN z.i
        |      ELSE 0 END,
        |    z.collisions + len(list_filter(z.slots, x -> x >= 0 AND
        |      len(list_filter(z.slots, y -> y = x)) > 1))
        |  FROM (
        |    SELECT r.grp, r.ks, r.i + 1 AS i, r.w, r.done, r.drained_round,
        |      r.collisions,
        |      list_transform(range(1, ${n + 1}), p -> $slotOf) AS slots
        |    FROM rec r WHERE r.i < $rounds) z),
        |fin AS (SELECT grp, drained_round,
        |    len(list_filter(done, d -> d = 1)) AS n_delivered,
        |    collisions, list_max(w) AS w_max
        |  FROM rec WHERE i = $rounds)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n_delivered = $n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fully_drained,
        |  CAST(SUM(n_delivered) AS BIGINT) AS delivered_total,
        |  CAST(SUM(n_delivered) * 10000 // (COUNT(*) * $n) AS BIGINT)
        |    AS delivered_e4,
        |  CAST(SUM(CASE WHEN drained_round > 0 THEN drained_round ELSE 0 END)
        |    AS BIGINT) AS drain_rounds_total,
        |  CAST(MAX(drained_round) AS BIGINT) AS drain_round_max,
        |  CAST(SUM(collisions) AS BIGINT) AS collisions_total,
        |  CAST(MAX(w_max) AS BIGINT) AS w_max_seen,
        |  CAST(SUM(CASE WHEN w_max <= 64 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_cap_violations
        |FROM fin""".stripMargin
    }
  )
}
