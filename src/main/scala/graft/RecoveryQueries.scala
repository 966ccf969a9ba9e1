package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-integrity wave (round 10, ninety-third wave): counting
  * Bloom deletions, ARIES undo/redo equivalence.
  *
  * q502 extends q337's Bloom audit to the COUNTING Bloom filter —
  * the variant that supports deletion, which a corpus pipeline needs
  * the moment right-to-be-forgotten erasures (q212) meet its
  * decontamination filters (q110). The filter is built fully
  * declaratively (counter[p] = inserts hitting p − deletes hitting
  * p, a groupBy — no fold, perfectly parallel at any scale): all
  * order keys are inserted with k = 3 hash positions in m = 65536
  * counters (load ~0.34 after deletion — the first draft's m = 4096
  * saturated the filter to a 99% false-positive rate, which the
  * emitted rate column made impossible to miss), a hash-chosen half is deleted, and three properties
  * are counted exactly — zero false negatives on survivors (a
  * survivor's own increments cannot be cancelled by other keys'
  * deletes, and the census proves it), counter conservation
  * Σcounter = 3·(inserts − deletes), and no counter underflow. The
  * measured false-positive rate on 15000 fresh probe keys sits
  * beside the deleted-half's ghost rate. q503 certifies the ARIES
  * recovery theorem on a real log: line items are update records in
  * (orderdate, orderkey, linenumber) log order, a hash-chosen crash
  * date splits transactions into committed and losers, and the
  * recovered value of every part is derived TWICE — declaratively
  * (last committed write wins) and MECHANICALLY, by a fold that
  * redoes the full log including loser writes while stacking
  * before-images, then unwinds the trailing losers in reverse order
  * exactly as the undo pass would. The two derivations agree on
  * every key, counted — redo-all-then-undo-losers ≡ replay-committed,
  * the equivalence crash recovery rests on. The certificate earned
  * its keep immediately: (orderkey, linenumber) is NOT unique in the
  * testdata, and the first draft's last-committed pick had no value
  * tiebreak — nondeterministic under the tie, one counted violation
  * — so the LSN order carries v as the final key on both sides.
  */
object RecoveryQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G447: counting Bloom filter with deletions ─────────────────────
    "q502_counting_bloom" -> ((s, dir) => {
      val m = 65536
      val keyed = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("case when pmod(md5_60(concat('del:', cast(o_orderkey as string))), 2) = 0 " +
            "then 1L else 0L end").as("deleted"))
      def pos(k: String, i: Int): String =
        s"pmod(md5_60(concat('cb$i:', cast($k as string))), $m)"
      val hits = keyed.select(col("k"), col("deleted"),
          explode(expr(s"array(${pos("k", 1)}, ${pos("k", 2)}, ${pos("k", 3)})"))
            .as("p"))
      val counters = hits.groupBy("p")
        .agg(count(lit(1)).as("ins"), sum("deleted").as("del"))
        .select(col("p"), expr("ins - del").as("c"))
      // membership probe: all three positions nonzero
      def member(df: DataFrame, keyCol: String): DataFrame = {
        val withPos = df.select(col(keyCol).as("pk"))
          .select(col("pk"),
            explode(expr(s"array(${pos("pk", 1)}, ${pos("pk", 2)}, ${pos("pk", 3)})"))
              .as("p"))
          .join(counters, Seq("p"), "left")
          .groupBy("pk")
          .agg(min(coalesce(col("c"), lit(0L))).as("minc"))
        withPos.select(col("pk"),
          expr("case when minc >= 1L then 1L else 0L end").as("found"))
      }
      val survivors = member(keyed.filter(col("deleted") === 0L), "k")
      val ghosts = member(keyed.filter(col("deleted") === 1L), "k")
      val probes = member(Tables.orders(s, dir)
        .select((col("o_orderkey") + 10000000L).as("pk0")), "pk0")
      val cstats = counters.agg(sum("c").as("c_sum"), min("c").as("c_min"),
        count(lit(1)).as("cells_used"))
      val sv = survivors.agg(count(lit(1)).as("n_surv"),
        sum("found").as("n_surv_found"))
      val gh = ghosts.agg(count(lit(1)).as("n_del"),
        sum("found").as("n_ghost_found"))
      val pr = probes.agg(count(lit(1)).as("n_probes"),
        sum("found").as("n_false_pos"))
      sv.crossJoin(gh).crossJoin(pr).crossJoin(cstats)
        .select(col("n_surv"), col("n_surv_found"),
          expr("case when n_surv_found = n_surv then 1L else 0L end")
            .as("no_false_negatives"),
          col("n_del"), col("n_ghost_found"),
          expr("n_ghost_found * 10000 div n_del").as("ghost_rate_e4"),
          col("n_probes"), col("n_false_pos"),
          expr("n_false_pos * 10000 div n_probes").as("fp_rate_e4"),
          col("cells_used"), col("c_min"),
          expr("case when c_min >= 0L then 1L else 0L end").as("no_underflow"),
          expr("case when c_sum = 3 * n_surv then 1L else 0L end")
            .as("conservation_ok"))
    }),

    // ── G448: ARIES redo-undo ≡ replay-committed ───────────────────────
    "q503_aries_equivalence" -> ((s, dir) => {
      // log records: (lsn order, txn, part key, value); crash splits
      // txns by commit date — committed iff orderdate <= crash date
      val crash = "date '1995-06-17'"
      val log = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("pk"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("v"),
          expr("cast(o_orderdate as date)").as("cd"),
          col("l_orderkey").as("txn"), col("l_linenumber").as("ln"))
        .withColumn("committed", expr(
          s"case when cd <= $crash then 1L else 0L end"))
      // derivation 1 (declarative): last committed write per part
      val direct = log.filter(col("committed") === 1L)
        .withColumn("rn", expr(
          "row_number() over (partition by pk order by cd desc, txn desc, ln desc, v desc)"))
        .filter(col("rn") === 1)
        .select(col("pk"), col("v").as("v_direct"))
      // derivation 2 (mechanical): redo ALL records in log order with
      // a before-image stack, then undo losers in reverse
      val perPart = log.groupBy("pk")
        .agg(expr("array_sort(collect_list(struct(cd, txn, ln, v, committed)))")
          .as("recs"), count(lit(1)).as("n_recs"),
          sum("committed").as("n_comm"))
        .withColumn("st", expr(
          """aggregate(recs,
            |  named_struct('cur', -1L,
            |    'undo', cast(array() as array<bigint>)),
            |  (acc, z) -> named_struct(
            |    'cur', z.v,
            |    'undo', case when z.committed = 0L
            |      then concat(acc.undo, array(acc.cur))
            |      else cast(array() as array<bigint>) end))""".stripMargin))
        // unwind: the before-image stack holds, for each trailing loser,
        // the value it overwrote; undoing in reverse restores undo[1]
        .select(col("pk"), col("n_recs"), col("n_comm"),
          expr("case when size(st.undo) = 0 then st.cur " +
            "else element_at(st.undo, 1) end").as("v_recovered"))
      perPart.join(direct, Seq("pk"), "left")
        .select(col("pk"), col("n_recs"), col("n_comm"),
          col("v_recovered"), coalesce(col("v_direct"), lit(-1L))
            .as("v_direct"))
        .withColumn("equiv", expr(
          "case when (n_comm = 0L and v_recovered = -1L) " +
            "or v_recovered = v_direct then 1L else 0L end"))
        .agg(count(lit(1)).as("n_parts"), sum("n_recs").as("n_log_records"),
          sum(expr("case when n_comm = 0L then 1L else 0L end"))
            .as("n_all_loser_parts"),
          sum(expr("1L - equiv")).as("n_equiv_violations"),
          expr("bit_xor(md5_60(concat(cast(pk as string), ':', " +
            "cast(v_recovered as string))))").as("xor60_states"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q502_counting_bloom" -> {
      val m = 65536
      def pos(k: String, i: Int): String =
        s"CAST('0x' || substr(md5('cb$i:' || CAST($k AS VARCHAR)), 1, 15) AS BIGINT) % $m"
      s"""WITH keyed AS (SELECT o_orderkey AS k,
        |    CASE WHEN CAST('0x' || substr(md5('del:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE 0 END AS deleted
        |  FROM orders),
        |hits AS (SELECT k, deleted, UNNEST([${pos("k", 1)}, ${pos("k", 2)},
        |    ${pos("k", 3)}]) AS p
        |  FROM keyed),
        |counters AS (SELECT p, COUNT(*) - SUM(deleted) AS c
        |  FROM hits GROUP BY p),
        |surv AS (SELECT h.k, MIN(COALESCE(c.c, 0)) AS minc
        |  FROM (SELECT k, UNNEST([${pos("k", 1)}, ${pos("k", 2)},
        |      ${pos("k", 3)}]) AS p
        |    FROM keyed WHERE deleted = 0) h
        |  LEFT JOIN counters c ON h.p = c.p GROUP BY h.k),
        |gh AS (SELECT h.k, MIN(COALESCE(c.c, 0)) AS minc
        |  FROM (SELECT k, UNNEST([${pos("k", 1)}, ${pos("k", 2)},
        |      ${pos("k", 3)}]) AS p
        |    FROM keyed WHERE deleted = 1) h
        |  LEFT JOIN counters c ON h.p = c.p GROUP BY h.k),
        |pr AS (SELECT h.k, MIN(COALESCE(c.c, 0)) AS minc
        |  FROM (SELECT k, UNNEST([${pos("k", 1)}, ${pos("k", 2)},
        |      ${pos("k", 3)}]) AS p
        |    FROM (SELECT o_orderkey + 10000000 AS k FROM orders)) h
        |  LEFT JOIN counters c ON h.p = c.p GROUP BY h.k),
        |cs AS (SELECT SUM(c) AS c_sum, MIN(c) AS c_min, COUNT(*) AS cells_used
        |  FROM counters)
        |SELECT CAST((SELECT COUNT(*) FROM surv) AS BIGINT) AS n_surv,
        |  CAST((SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END) FROM surv)
        |    AS BIGINT) AS n_surv_found,
        |  CAST(CASE WHEN (SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END)
        |      FROM surv) = (SELECT COUNT(*) FROM surv)
        |    THEN 1 ELSE 0 END AS BIGINT) AS no_false_negatives,
        |  CAST((SELECT COUNT(*) FROM gh) AS BIGINT) AS n_del,
        |  CAST((SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END) FROM gh)
        |    AS BIGINT) AS n_ghost_found,
        |  CAST((SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END) FROM gh)
        |    * 10000 // (SELECT COUNT(*) FROM gh) AS BIGINT) AS ghost_rate_e4,
        |  CAST((SELECT COUNT(*) FROM pr) AS BIGINT) AS n_probes,
        |  CAST((SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END) FROM pr)
        |    AS BIGINT) AS n_false_pos,
        |  CAST((SELECT SUM(CASE WHEN minc >= 1 THEN 1 ELSE 0 END) FROM pr)
        |    * 10000 // (SELECT COUNT(*) FROM pr) AS BIGINT) AS fp_rate_e4,
        |  CAST(cs.cells_used AS BIGINT) AS cells_used,
        |  CAST(cs.c_min AS BIGINT) AS c_min,
        |  CAST(CASE WHEN cs.c_min >= 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS no_underflow,
        |  CAST(CASE WHEN cs.c_sum = 3 * (SELECT COUNT(*) FROM surv)
        |    THEN 1 ELSE 0 END AS BIGINT) AS conservation_ok
        |FROM cs""".stripMargin
    },

    "q503_aries_equivalence" ->
      """WITH RECURSIVE log AS (SELECT l_partkey AS pk,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(o_orderdate AS DATE) AS cd, l_orderkey AS txn,
        |    l_linenumber AS ln,
        |    CASE WHEN CAST(o_orderdate AS DATE) <= DATE '1995-06-17'
        |      THEN 1 ELSE 0 END AS committed
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |direct AS (SELECT pk, v AS v_direct FROM (
        |    SELECT pk, v, ROW_NUMBER() OVER (PARTITION BY pk
        |      ORDER BY cd DESC, txn DESC, ln DESC, v DESC) AS rn
        |    FROM log WHERE committed = 1) WHERE rn = 1),
        |seq AS (SELECT pk, v, committed,
        |    ROW_NUMBER() OVER (PARTITION BY pk ORDER BY cd, txn, ln, v) AS i
        |  FROM log),
        |np AS (SELECT pk, COUNT(*) AS n, SUM(committed) AS n_comm
        |  FROM log GROUP BY pk),
        |rec AS (
        |  SELECT pk, 0::BIGINT AS i, -1::BIGINT AS cur, []::BIGINT[] AS undo
        |  FROM np
        |  UNION ALL
        |  SELECT s.pk, s.i, s.v,
        |    (CASE WHEN s.committed = 0 THEN list_concat(r.undo, [r.cur])
        |          ELSE []::BIGINT[] END)::BIGINT[]
        |  FROM rec r JOIN seq s ON s.pk = r.pk AND s.i = r.i + 1),
        |fin AS (SELECT r.pk, np.n AS n_recs, np.n_comm,
        |    CASE WHEN len(r.undo) = 0 THEN r.cur ELSE r.undo[1] END
        |      AS v_recovered
        |  FROM rec r JOIN np ON r.pk = np.pk WHERE r.i = np.n),
        |eq AS (SELECT f.pk, f.n_recs, f.n_comm, f.v_recovered,
        |    COALESCE(d.v_direct, -1) AS v_direct
        |  FROM fin f LEFT JOIN direct d ON f.pk = d.pk)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(n_recs) AS BIGINT) AS n_log_records,
        |  CAST(SUM(CASE WHEN n_comm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_all_loser_parts,
        |  CAST(SUM(CASE WHEN (n_comm = 0 AND v_recovered = -1)
        |    OR v_recovered = v_direct THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_equiv_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(pk AS VARCHAR) || ':' ||
        |    CAST(v_recovered AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_states
        |FROM eq""".stripMargin
  )
}
