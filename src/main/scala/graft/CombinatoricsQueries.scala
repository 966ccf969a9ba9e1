package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Combinatorics wave (round 10, hundred-third wave): the ballot
  * problem, derangements.
  *
  * q517 settles the ballot problem at n = 8 three ways. Exhaustive:
  * all 2¹⁶ sixteen-step ±1 walks are enumerated in-engine — exactly
  * C(16,8) = 12870 return to zero, and exactly the Catalan number
  * C₈ = 1430 of those never dip below zero, so the conditional
  * probability of staying nonnegative is EXACTLY 1430/12870 = 1/9,
  * proven by enumeration. Measured: every order key draws a 16-step
  * hash walk, and among the walks that happen to balance, the
  * nonnegative share is counted beside the exact 1/9. q518 does the
  * same for derangements at n = 8: the subfactorial recurrence
  * D(k) = (k−1)(D(k−1) + D(k−2)) folds up to D(8) = 14833 in-query
  * (certified against the inclusion-exclusion closed form as a
  * literal), hash-ranked 8-customer groups induce real permutations
  * (rank of one hash vs rank of another), fixed points are counted
  * per group, and the fixed-point-free share sits beside the exact
  * D(8)/8! = 0.36788 — the 1/e law of the hat-check problem, on
  * corpus keys.
  */
object CombinatoricsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G462: ballot problem — exhaustive Catalan + measured ───────────
    "q517_ballot_catalan" -> ((s, dir) => {
      // walk encoded by bits of v: bit j = +1 step, else −1, carried as
      // CHAINED SCALAR COLUMNS (position p, running min mn) — 16 codegen
      // steps per row instead of the r10 interpreted fold (3.7 s bench)
      def walkChain(df: DataFrame): DataFrame =
        (0 until 16).foldLeft(
          df.withColumn("p", lit(0L)).withColumn("mn", lit(0L))) { (d, j) =>
          d.withColumn("p", expr(
              s"p + (case when (v div ${1L << j}L) % 2 = 1 then 1L else -1L end)"))
            .withColumn("mn", expr("least(mn, p)"))
        }
      val exhaustive = walkChain(
        Tables.orders(s, dir).sparkSession.range(0, 65536)
          .select(col("id").as("v")))
        .agg(count(lit(1)).as("n_walks"),
          sum(expr("case when p = 0L then 1L else 0L end")).as("n_balanced"),
          sum(expr("case when p = 0L and mn >= 0L then 1L else 0L end"))
            .as("n_dyck"))
      val sample = walkChain(Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("pmod(md5_60(concat('bw:', cast(o_orderkey as string))), 65536)")
            .as("v")))
        .agg(count(lit(1)).as("n_keys"),
          sum(expr("case when p = 0L then 1L else 0L end"))
            .as("n_keys_balanced"),
          sum(expr("case when p = 0L and mn >= 0L then 1L else 0L end"))
            .as("n_keys_dyck"))
      exhaustive.crossJoin(sample)
        .select(col("n_walks"), col("n_balanced"),
          expr("case when n_balanced = 12870L then 1L else 0L end")
            .as("binomial_exact"),
          col("n_dyck"),
          expr("case when n_dyck = 1430L then 1L else 0L end")
            .as("catalan_exact"),
          expr("n_dyck * 10000 div n_balanced").as("ballot_exact_e4"),
          col("n_keys"), col("n_keys_balanced"), col("n_keys_dyck"),
          expr("case when n_keys_balanced = 0L then -1L " +
            "else n_keys_dyck * 10000 div n_keys_balanced end")
            .as("ballot_measured_e4"))
    }),

    // ── G463: derangements — subfactorial fold + measured 1/e ──────────
    "q518_derangements" -> ((s, dir) => {
      // D(k) = (k−1)(D(k−1) + D(k−2)), D(0)=1, D(1)=0 — fold carries
      // the last two values
      val subfact =
        """aggregate(sequence(2, 8),
          |  named_struct('d2', 1L, 'd1', 0L),
          |  (acc, kk) -> named_struct('d2', acc.d1,
          |    'd1', (cast(kk as bigint) - 1L) * (acc.d1 + acc.d2)),
          |  f -> f.d1)""".stripMargin
      val tot = Tables.customer(s, dir).agg(
        expr("greatest(count(1) div 8, 1L)").as("g_mod"))
      // permutation per group: position of the customer under hash h1
      // order maps to position under h2 order; a fixed point = same rank
      val perms = Tables.customer(s, dir).crossJoin(broadcast(tot))
        .select(col("c_custkey").as("c"),
          expr("pmod(md5_60(concat('dg:', cast(c_custkey as string))), g_mod)")
            .as("grp"),
          expr("md5_60(concat('h1:', cast(c_custkey as string)))").as("h1"),
          expr("md5_60(concat('h2:', cast(c_custkey as string)))").as("h2"))
        .withColumn("r1", expr(
          "row_number() over (partition by grp order by h1, c)"))
        .withColumn("r2", expr(
          "row_number() over (partition by grp order by h2, c)"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_c"),
          sum(expr("case when r1 = r2 then 1L else 0L end")).as("n_fixed"))
        .filter(col("n_c") === 8)
      val agg = perms.agg(count(lit(1)).as("n_groups"),
        sum(expr("case when n_fixed = 0L then 1L else 0L end"))
          .as("n_derangements"),
        sum("n_fixed").as("fixed_total"))
      Tables.customer(s, dir).sparkSession.range(0, 1)
        .select(expr(s"cast(($subfact) as bigint)").as("d8_fold"))
        .crossJoin(agg)
        .select(col("d8_fold"),
          expr("case when d8_fold = 14833L then 1L else 0L end")
            .as("subfactorial_exact"),
          lit(14833L * 10000L / 40320L).as("derangement_theory_e4"),
          col("n_groups"), col("n_derangements"),
          expr("n_derangements * 10000 div n_groups")
            .as("derangement_measured_e4"),
          col("fixed_total"),
          expr("fixed_total * 10000 div (n_groups * 8L)")
            .as("fixed_rate_e4"),
          // E[fixed points] = 1 exactly, for any n — the other classic
          lit(1250L).as("fixed_rate_theory_e4"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q517_ballot_catalan" -> {
      def walkD(src: String): String =
        s"""(SELECT $src.v AS v,
           |  list_sum(list_transform(range(0, 16), j ->
           |    CASE WHEN ($src.v // (CASE j WHEN 0 THEN 1 WHEN 1 THEN 2
           |      WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32
           |      WHEN 6 THEN 64 WHEN 7 THEN 128 WHEN 8 THEN 256
           |      WHEN 9 THEN 512 WHEN 10 THEN 1024 WHEN 11 THEN 2048
           |      WHEN 12 THEN 4096 WHEN 13 THEN 8192 WHEN 14 THEN 16384
           |      ELSE 32768 END)) % 2 = 1 THEN 1 ELSE -1 END)) AS p,
           |  list_min(list_transform(range(1, 17), t ->
           |    list_sum(list_transform(range(0, CAST(t AS INT)), j ->
           |      CASE WHEN ($src.v // (CASE j WHEN 0 THEN 1 WHEN 1 THEN 2
           |        WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32
           |        WHEN 6 THEN 64 WHEN 7 THEN 128 WHEN 8 THEN 256
           |        WHEN 9 THEN 512 WHEN 10 THEN 1024 WHEN 11 THEN 2048
           |        WHEN 12 THEN 4096 WHEN 13 THEN 8192 WHEN 14 THEN 16384
           |        ELSE 32768 END)) % 2 = 1 THEN 1 ELSE -1 END)))) AS mn
           |FROM $src)""".stripMargin
      s"""WITH allv AS (SELECT UNNEST(range(0, 65536)) AS v),
        |aw AS ${walkD("allv")},
        |ex AS (SELECT COUNT(*) AS n_walks,
        |    SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS n_balanced,
        |    SUM(CASE WHEN p = 0 AND mn >= 0 THEN 1 ELSE 0 END) AS n_dyck
        |  FROM aw),
        |keysv AS (SELECT CAST('0x' || substr(md5('bw:' ||
        |    CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 65536 AS v
        |  FROM orders),
        |kw AS ${walkD("keysv")},
        |sm AS (SELECT COUNT(*) AS n_keys,
        |    SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS n_keys_balanced,
        |    SUM(CASE WHEN p = 0 AND mn >= 0 THEN 1 ELSE 0 END)
        |      AS n_keys_dyck
        |  FROM kw)
        |SELECT CAST(n_walks AS BIGINT) AS n_walks,
        |  CAST(n_balanced AS BIGINT) AS n_balanced,
        |  CAST(CASE WHEN n_balanced = 12870 THEN 1 ELSE 0 END AS BIGINT)
        |    AS binomial_exact,
        |  CAST(n_dyck AS BIGINT) AS n_dyck,
        |  CAST(CASE WHEN n_dyck = 1430 THEN 1 ELSE 0 END AS BIGINT)
        |    AS catalan_exact,
        |  CAST(n_dyck * 10000 // n_balanced AS BIGINT) AS ballot_exact_e4,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(n_keys_balanced AS BIGINT) AS n_keys_balanced,
        |  CAST(n_keys_dyck AS BIGINT) AS n_keys_dyck,
        |  CAST(CASE WHEN n_keys_balanced = 0 THEN -1
        |    ELSE n_keys_dyck * 10000 // n_keys_balanced END AS BIGINT)
        |    AS ballot_measured_e4
        |FROM ex, sm""".stripMargin
    },

    "q518_derangements" ->
      """WITH RECURSIVE sf AS (
        |  SELECT 1::BIGINT AS kk, 1::BIGINT AS d2, 0::BIGINT AS d1
        |  UNION ALL
        |  SELECT kk + 1, d1, kk * (d1 + d2) FROM sf WHERE kk < 8),
        |d8 AS (SELECT d1 AS d8_fold FROM sf WHERE kk = 8),
        |tot AS (SELECT GREATEST(COUNT(*) // 8, 1) AS g_mod FROM customer),
        |ranked AS (SELECT c, grp,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h1, c) AS r1,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h2, c) AS r2
        |  FROM (SELECT c_custkey AS c,
        |      CAST('0x' || substr(md5('dg:' || CAST(c_custkey AS VARCHAR)),
        |        1, 15) AS BIGINT) % (SELECT g_mod FROM tot) AS grp,
        |      CAST('0x' || substr(md5('h1:' || CAST(c_custkey AS VARCHAR)),
        |        1, 15) AS BIGINT) AS h1,
        |      CAST('0x' || substr(md5('h2:' || CAST(c_custkey AS VARCHAR)),
        |        1, 15) AS BIGINT) AS h2
        |    FROM customer)),
        |perms AS (SELECT grp, COUNT(*) AS n_c,
        |    SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS n_fixed
        |  FROM ranked GROUP BY grp HAVING COUNT(*) = 8),
        |agg AS (SELECT COUNT(*) AS n_groups,
        |    SUM(CASE WHEN n_fixed = 0 THEN 1 ELSE 0 END) AS n_derangements,
        |    SUM(n_fixed) AS fixed_total
        |  FROM perms)
        |SELECT CAST(d8.d8_fold AS BIGINT) AS d8_fold,
        |  CAST(CASE WHEN d8.d8_fold = 14833 THEN 1 ELSE 0 END AS BIGINT)
        |    AS subfactorial_exact,
        |  CAST(3678 AS BIGINT) AS derangement_theory_e4,
        |  CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(n_derangements AS BIGINT) AS n_derangements,
        |  CAST(n_derangements * 10000 // n_groups AS BIGINT)
        |    AS derangement_measured_e4,
        |  CAST(fixed_total AS BIGINT) AS fixed_total,
        |  CAST(fixed_total * 10000 // (n_groups * 8) AS BIGINT)
        |    AS fixed_rate_e4,
        |  CAST(1250 AS BIGINT) AS fixed_rate_theory_e4
        |FROM d8, agg""".stripMargin
  )
}
