package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Primality wave (round 10, eighty-ninth wave): deterministic
  * Miller–Rabin certified against trial division.
  *
  * q497 derives an odd candidate m = 5 + 2·(md5 mod 500000) ∈
  * [5, 10⁶+3] from every order key and classifies it twice by
  * completely different mathematics: (a) trial division by every odd
  * d ≤ √m (exploded divisor join — codegen'd, the exact ground
  * truth), and (b) Miller–Rabin with witness bases {2, 3}, which is
  * PROVABLY deterministic below 1,373,653 (Pomerance–Selfridge–
  * Wagstaff) — not probabilistic at this range. The MR machinery is
  * one native codegen'd Expression per base (graft.plans.MrKernel:
  * s = ν₂(m−1), d = (m−1)/2ˢ, aᵈ mod m by square-and-multiply with
  * products ≤ 10¹² — BIGINT-safe — then the witness chase x → x² mod
  * m for r < s looking for m−1). The theorem is COUNTED: agreement on
  * every key, plus the prime density beside the odd-restricted PNT
  * estimate 2/ln(m) — which the corpus hits within 0.3%. The oracle
  * independently replays both modpow folds as recursive CTEs per
  * (key, base) — a cross-engine check of the kernel itself.
  */
object PrimalityQueries {


  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G442: Miller–Rabin {2,3} ≡ trial division below 1.37M ──────────
    "q497_miller_rabin" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("5L + 2L * pmod(md5_60(concat('mr:', cast(o_orderkey as string))), 500000L)")
            .as("m"))
      // ground truth: a composite m has a PRIME divisor ≤ √m, so the 167
      // odd primes < 1000 suffice as trial divisors (q514's discipline)
      val oddPrimes = (3 to 999 by 2).filter(n =>
        (3 to math.sqrt(n).toInt by 2).forall(n % _ != 0))
      val comp = base
        .select(col("k"), col("m"),
          explode(lit(oddPrimes.map(_.toLong).toArray)).as("d"))
        .filter(expr("d * d <= m and m % d = 0"))
        .groupBy("k").agg(count(lit(1)).as("n_div"))
      // modpow + witness chase in ONE native codegen'd Expression per
      // base ([[graft.plans.MrKernel]]): the r10 draft ran both as
      // interpreted HOF folds (7.7 s of bench) and a chained-Project
      // rewrite still paid one row materialization per squaring (the
      // 80-Project chain never fused into whole-stage codegen). The
      // kernel is the charter's preference order at work: a custom
      // Catalyst Expression with doGenCode beats per-row lambdas.
      val mr = base
        .withColumn("p2", expr("mr_pass(m, 2)"))
        .withColumn("p3", expr("mr_pass(m, 3)"))
        .withColumn("mr_prime", expr(
          "case when p2 = 1L and p3 = 1L then 1L else 0L end"))
      val joined = mr.join(comp, Seq("k"), "left")
        .withColumn("truth_prime", expr(
          "case when n_div is null then 1L else 0L end"))
      joined.agg(count(lit(1)).as("n_keys"),
          sum("mr_prime").as("n_mr_prime"),
          sum("truth_prime").as("n_truth_prime"),
          sum(expr("case when mr_prime = truth_prime then 1L else 0L end"))
            .as("n_agree"),
          min("m").as("m_min"), max("m").as("m_max"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(mr_prime as string))))").as("xor60_verdicts"))
        .withColumn("prime_density_e4", expr(
          "n_truth_prime * 10000 div n_keys"))
        // PNT flavor for ODD candidates: 2/ln(5·10⁵) ≈ 0.1524 → 1524 at
        // e4 (the factor 2 because even numbers were excluded by
        // construction — measured 1520 at sf0.01, a 0.3% miss)
        .withColumn("pnt_expected_e4", lit(1524L))
        .select("n_keys", "n_mr_prime", "n_truth_prime", "n_agree",
          "prime_density_e4", "pnt_expected_e4", "m_min", "m_max",
          "xor60_verdicts")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q497_miller_rabin" -> {
      def pow2D(e: String): String =
        "(CASE " + (0 to 20).map(k => s"WHEN $e = $k THEN ${1L << k}")
          .mkString(" ") + " END)"
      s"""WITH RECURSIVE base AS (SELECT o_orderkey AS k,
        |    5 + 2 * (CAST('0x' || substr(md5('mr:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 500000) AS m
        |  FROM orders),
        |bs AS (SELECT k, m,
        |    (CASE ${(20 to 1 by -1).map(t =>
             s"WHEN (m - 1) % ${1L << t} = 0 THEN $t").mkString(" ")}
        |      ELSE 0 END) AS s2
        |  FROM base),
        |bd AS (SELECT k, m, s2, (m - 1) // ${pow2D("s2")} AS dd FROM bs),
        |comp AS (SELECT b.k, COUNT(*) AS n_div
        |  FROM base b, (SELECT UNNEST(range(3, 1000, 2)) AS d) d
        |  WHERE d.d * d.d <= b.m AND b.m % d.d = 0
        |  GROUP BY b.k),
        |mp AS (
        |  SELECT k, m, s2, dd, a.a, 0::BIGINT AS j, 1::BIGINT AS x
        |  FROM bd, (SELECT UNNEST([2, 3]) AS a) a
        |  UNION ALL
        |  SELECT z.k, z.m, z.s2, z.dd, z.a, z.j,
        |    CASE WHEN (z.dd // ${pow2D("(19 - (z.j - 1))")}) % 2 = 1
        |      THEN ((z.x * z.x) % z.m * z.a) % z.m
        |      ELSE (z.x * z.x) % z.m END
        |  FROM (SELECT r.k, r.m, r.s2, r.dd, r.a, r.j + 1 AS j, r.x
        |        FROM mp r WHERE r.j < 20) z),
        |x0 AS (SELECT k, m, s2, a, x FROM mp WHERE j = 20),
        |ch AS (
        |  SELECT k, m, s2, a, 0::BIGINT AS r, x,
        |    CASE WHEN x = 1 OR x = m - 1 THEN 1 ELSE 0 END AS ok
        |  FROM x0
        |  UNION ALL
        |  SELECT z.k, z.m, z.s2, z.a, z.r,
        |    CASE WHEN z.stay = 1 THEN z.x ELSE (z.x * z.x) % z.m END,
        |    CASE WHEN z.stay = 1 THEN z.ok
        |      WHEN (z.x * z.x) % z.m = z.m - 1 THEN 1 ELSE 0 END
        |  FROM (SELECT r.k, r.m, r.s2, r.a, r.r + 1 AS r, r.x, r.ok,
        |      CASE WHEN r.ok = 1 OR r.r + 1 > r.s2 - 1 THEN 1 ELSE 0 END
        |        AS stay
        |    FROM ch r WHERE r.r < 19) z),
        |pass AS (SELECT k, m,
        |    MIN(CASE WHEN a = 2 THEN ok END) AS p2,
        |    MIN(CASE WHEN a = 3 THEN ok END) AS p3
        |  FROM ch WHERE r = 19 GROUP BY k, m),
        |fin AS (SELECT p.k, p.m,
        |    CASE WHEN p.p2 = 1 AND p.p3 = 1 THEN 1 ELSE 0 END AS mr_prime,
        |    CASE WHEN c.n_div IS NULL THEN 1 ELSE 0 END AS truth_prime
        |  FROM pass p LEFT JOIN comp c ON p.k = c.k)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(mr_prime) AS BIGINT) AS n_mr_prime,
        |  CAST(SUM(truth_prime) AS BIGINT) AS n_truth_prime,
        |  CAST(SUM(CASE WHEN mr_prime = truth_prime THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_agree,
        |  CAST(SUM(truth_prime) * 10000 // COUNT(*) AS BIGINT)
        |    AS prime_density_e4,
        |  CAST(1524 AS BIGINT) AS pnt_expected_e4,
        |  CAST(MIN(m) AS BIGINT) AS m_min, CAST(MAX(m) AS BIGINT) AS m_max,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(mr_prime AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_verdicts
        |FROM fin""".stripMargin
    }
  )
}
