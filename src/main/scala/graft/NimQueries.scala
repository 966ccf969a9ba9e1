package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Game-theory wave (round 10, one-hundredth wave): Bouton's theorem
  * by exhaustive retrograde analysis.
  *
  * q512 proves Bouton's 1901 theorem — a three-pile Nim position is
  * losing for the mover iff a⊕b⊕c = 0 — for every one of the 11³ =
  * 1331 states with piles ≤ 10, by game-theoretic ground truth: a
  * retrograde DP fold over states in index order (each state's moves
  * only reach smaller indexes, so the growing win/loss array is
  * always ahead of the read) marks a state winning iff SOME move
  * reaches a losing state, with no reference to XOR anywhere in the
  * recursion. The DP verdict is then compared against the XOR rule
  * on all 1331 states — zero disagreements, a complete proof at this
  * board size. Real positions follow: customers hash into triples,
  * their order counts mod 11 are the piles, and each real game is
  * classified by BOTH derivations (agreeing, as just proven), with
  * the P-position rate beside its combinatorial expectation — 91 of
  * the 1331 states are losing (NOT 11² = 121: c = a⊕b must itself
  * stay ≤ 10, the first draft's miscount), so uniform play loses
  * 6.8% of openings; the measured rate on real piles sits beside it.
  */
object NimQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G457: Bouton's theorem, retrograde DP vs XOR, exhaustively ─────
    "q512_nim_bouton" -> ((s, dir) => {
      // W[i+1] = 1 iff state i = (a,b,c) has a move to a losing state;
      // moves shrink one pile, so they point at already-built entries.
      // Fixed 0..10 scan with the pile bound INSIDE the predicate:
      // sequence(0, p-1) DESCENDS when p = 0 (the q486 trap), and HOF
      // predicates don't short-circuit, so the read is try_element_at
      def exists(pile: String, stride: Int, base: String): String =
        s"size(filter(sequence(0, 10), m -> m < $pile and " +
          s"coalesce(try_element_at(acc, cast(m * $stride + $base + 1 as int)), 1L) = 0L)) > 0"
      val dp =
        s"""aggregate(sequence(0, 1330),
           |  cast(array() as array<bigint>),
           |  (acc, i) -> concat(acc, array(
           |    case when ${exists("i div 121", 121, "pmod(i, 121)")}
           |      or ${exists("pmod(i div 11, 11)", 11,
                  "(i div 121) * 121 + pmod(i, 11)")}
           |      or ${exists("pmod(i, 11)", 1, "(i div 11) * 11")}
           |    then 1L else 0L end)))""".stripMargin
      val enumRow = Tables.customer(s, dir).sparkSession.range(0, 1)
        .withColumn("w", expr(dp))
        .withColumn("n_disagree", expr(
          """cast(size(filter(sequence(0, 1330), i ->
            |  element_at(w, cast(i + 1 as int)) !=
            |  (case when ((i div 121) ^ pmod(i div 11, 11) ^ pmod(i, 11))
            |     != 0L then 1L else 0L end))) as bigint)""".stripMargin))
        .withColumn("n_losing", expr(
          "cast(size(filter(w, x -> x = 0L)) as bigint)"))
      val tot = Tables.customer(s, dir).agg(
        expr("greatest(count(1) div 3, 1L)").as("g_mod"))
      val piles = Tables.customer(s, dir).crossJoin(broadcast(tot))
        .join(Tables.orders(s, dir).groupBy(col("o_custkey").as("c_custkey"))
          .agg(count(lit(1)).as("oc")), Seq("c_custkey"), "left")
        .select(col("c_custkey").as("c"),
          expr("pmod(coalesce(oc, 0L), 11)").as("pile"),
          expr("pmod(md5_60(concat('nim:', cast(c_custkey as string))), g_mod)")
            .as("grp"))
        .groupBy("grp")
        .agg(expr("array_sort(collect_list(struct(c, pile)))").as("xs"),
          count(lit(1)).as("n_c"))
        .filter(col("n_c") === 3)
        .select(expr("element_at(xs, 1).pile").as("a"),
          expr("element_at(xs, 2).pile").as("b"),
          expr("element_at(xs, 3).pile").as("c"))
        .withColumn("xor_losing", expr(
          "case when (a ^ b ^ c) = 0L then 1L else 0L end"))
      val dataAgg = piles.agg(count(lit(1)).as("n_games"),
        sum("xor_losing").as("n_p_positions"))
      enumRow.crossJoin(dataAgg)
        .select(lit(1331L).as("n_states"), col("n_disagree"),
          expr("case when n_disagree = 0L then 1L else 0L end")
            .as("bouton_proved"),
          col("n_losing"),
          expr("case when n_losing = 91L then 1L else 0L end")
            .as("p_count_exact"),
          col("n_games"), col("n_p_positions"),
          expr("n_p_positions * 10000 div n_games").as("p_rate_e4"),
          lit(91L * 10000L / 1331L).as("uniform_p_rate_e4"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q512_nim_bouton" ->
      """WITH RECURSIVE dp AS (
        |  SELECT -1::BIGINT AS i, []::BIGINT[] AS acc
        |  UNION ALL
        |  SELECT z.i, list_concat(z.acc, [CASE WHEN z.win THEN 1 ELSE 0 END])
        |  FROM (
        |    SELECT d.i + 1 AS i, d.acc,
        |      (len(list_filter(range(0, (d.i + 1) // 121),
        |         m -> d.acc[CAST(m * 121 + ((d.i + 1) % 121) + 1 AS INT)] = 0))
        |       > 0)
        |      OR (len(list_filter(range(0, ((d.i + 1) // 11) % 11),
        |         m -> d.acc[CAST(m * 11 + ((d.i + 1) // 121) * 121
        |           + ((d.i + 1) % 11) + 1 AS INT)] = 0)) > 0)
        |      OR (len(list_filter(range(0, (d.i + 1) % 11),
        |         m -> d.acc[CAST(m + ((d.i + 1) // 11) * 11 + 1 AS INT)] = 0))
        |       > 0) AS win
        |    FROM dp d WHERE d.i < 1330) z),
        |wrow AS (SELECT acc AS w FROM dp WHERE i = 1330),
        |chk AS (SELECT
        |    len(list_filter(range(0, 1331), i ->
        |      w[CAST(i + 1 AS INT)] !=
        |      (CASE WHEN xor(xor(i // 121, (i // 11) % 11), i % 11) != 0
        |       THEN 1 ELSE 0 END))) AS n_disagree,
        |    len(list_filter(w, x -> x = 0)) AS n_losing
        |  FROM wrow),
        |tot AS (SELECT GREATEST(COUNT(*) // 3, 1) AS g_mod FROM customer),
        |oc AS (SELECT o_custkey AS c, COUNT(*) AS oc FROM orders GROUP BY 1),
        |piles AS (SELECT grp, list_sort(list({'c': c, 'pile': pile})) AS xs,
        |    COUNT(*) AS n_c
        |  FROM (SELECT cu.c_custkey AS c,
        |      COALESCE(oc.oc, 0) % 11 AS pile,
        |      CAST('0x' || substr(md5('nim:' || CAST(cu.c_custkey AS VARCHAR)),
        |        1, 15) AS BIGINT) % (SELECT g_mod FROM tot) AS grp
        |    FROM customer cu LEFT JOIN oc ON cu.c_custkey = oc.c)
        |  GROUP BY grp HAVING COUNT(*) = 3),
        |games AS (SELECT xs[1].pile AS a, xs[2].pile AS b, xs[3].pile AS c
        |  FROM piles),
        |da AS (SELECT COUNT(*) AS n_games,
        |    SUM(CASE WHEN xor(xor(a, b), c) = 0 THEN 1 ELSE 0 END)
        |      AS n_p_positions
        |  FROM games)
        |SELECT CAST(1331 AS BIGINT) AS n_states,
        |  CAST(chk.n_disagree AS BIGINT) AS n_disagree,
        |  CAST(CASE WHEN chk.n_disagree = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS bouton_proved,
        |  CAST(chk.n_losing AS BIGINT) AS n_losing,
        |  CAST(CASE WHEN chk.n_losing = 91 THEN 1 ELSE 0 END AS BIGINT)
        |    AS p_count_exact,
        |  CAST(da.n_games AS BIGINT) AS n_games,
        |  CAST(da.n_p_positions AS BIGINT) AS n_p_positions,
        |  CAST(da.n_p_positions * 10000 // da.n_games AS BIGINT) AS p_rate_e4,
        |  CAST(683 AS BIGINT) AS uniform_p_rate_e4
        |FROM chk, da""".stripMargin
  )
}
