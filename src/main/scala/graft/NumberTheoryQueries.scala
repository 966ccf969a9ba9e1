package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Number-theory wave (round 10, hundred-first wave): Fermat
  * pseudoprimes, twin primes vs Hardy–Littlewood.
  *
  * q513 answers the question q497 begs: why Miller–Rabin and not
  * plain Fermat? Same candidates (m = 5 + 2·(md5 mod 500000)), same
  * 20-step modpow fold, but the test is Fermat's 2^(m−1) ≡ 1: every
  * true prime passes (Fermat's little theorem — a certificate, since
  * gcd(2, odd m) = 1), and the composites that ALSO pass are counted
  * — the base-2 pseudoprimes (341, 561, …; 245 exist below 10⁶, so a
  * 3% sample expects a handful). Each pseudoprime is a key the
  * Fermat test would have waved through; MR with the same budget
  * catches them all (cross-checked against q497's verdicts in the
  * spec). q514 counts twin primes among the same candidates — m and
  * m + 2 both prime by trial division — and sets the measured count
  * beside the Hardy–Littlewood prediction 2·2C₂·n/ln²m (the extra 2
  * because the candidates are all odd — twins only live at odd
  * positions) with 2C₂ = 1.320323 as an e6 design literal: the
  * conjecture's density checked in exact integers, the measured
  * ~+17% excess being Jensen's inequality on 1/ln²m over the
  * sampled range.
  */
object NumberTheoryQueries {


  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G458: Fermat pseudoprime census ────────────────────────────────
    "q513_fermat_pseudoprimes" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("5L + 2L * pmod(md5_60(concat('mr:', cast(o_orderkey as string))), 500000L)")
            .as("m"))
      // odd primes < 1000 suffice as trial divisors (smallest-prime-
      // factor argument; q514's explode discipline) — but n_div here
      // counts DIVISORS TRIED THAT DIVIDE, used only as a null/non-null
      // composite flag downstream, so the prime-only subset is safe
      val oddPrimes = (3 to 999 by 2).filter(n =>
        (3 to math.sqrt(n).toInt by 2).forall(n % _ != 0))
      val comp = base
        .select(col("k"), col("m"),
          explode(lit(oddPrimes.map(_.toLong).toArray)).as("d"))
        .filter(expr("d * d <= m and m % d = 0"))
        .groupBy("k").agg(count(lit(1)).as("n_div"))
      // Fermat: x = 2^(m−1) mod m — the full exponent, no witness chase
      // — in one native codegen'd kernel (graft.plans.FermatKernel; the
      // r10 interpreted 20-step HOF fold was the query's last 3 s)
      val f = base.withColumn("fx", expr("fermat_pow(m, 2)"))
        .withColumn("fermat_pass", expr(
          "case when fx = 1L then 1L else 0L end"))
        .join(comp, Seq("k"), "left")
        .withColumn("is_prime", expr(
          "case when n_div is null then 1L else 0L end"))
      f.agg(count(lit(1)).as("n_keys"),
          sum("is_prime").as("n_prime"),
          sum(expr("is_prime * fermat_pass")).as("n_prime_pass"),
          sum(expr("(1L - is_prime) * fermat_pass")).as("n_pseudoprimes"),
          expr("coalesce(bit_xor(case when is_prime = 0L and fermat_pass = 1L " +
            "then m end), 0L)").as("xor_pseudoprime_values"),
          coalesce(min(expr("case when is_prime = 0L and fermat_pass = 1L " +
            "then m end")), lit(0L)).as("smallest_pseudoprime"))
        .withColumn("flt_certificate", expr(
          "case when n_prime_pass = n_prime then 1L else 0L end"))
        .select("n_keys", "n_prime", "n_prime_pass", "flt_certificate",
          "n_pseudoprimes", "smallest_pseudoprime", "xor_pseudoprime_values")
    }),

    // ── G459: twin primes vs Hardy–Littlewood ──────────────────────────
    "q514_twin_primes" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("5L + 2L * pmod(md5_60(concat('mr:', cast(o_orderkey as string))), 500000L)")
            .as("m"))
      // Trial-divide by the 167 ODD PRIMES < 1000 only (equivalent to
      // all odd d — any odd divisor's smallest prime factor also
      // divides), through an EXPLODE so the arithmetic stays inside
      // whole-stage codegen. The first draft ran two 499-element
      // higher-order `filter` lambdas per row (HOFs are
      // CodegenFallback → interpreted, boxed): 150 M interpreted evals
      // = 21.6 s of the r10 bench. Both m and m+2 are tested in ONE
      // explode pass; only dividing rows survive to the groupBy (~2
      // rows per key), so the shuffle is key-sized, not 25 M rows.
      val oddPrimes = (3 to 999 by 2).filter(n =>
        (3 to math.sqrt(n).toInt by 2).forall(n % _ != 0))
      val div = base
        .select(col("k"), col("m"),
          explode(lit(oddPrimes.map(_.toLong).toArray)).as("d"))
        .filter(expr("(d * d <= m and m % d = 0) or " +
          "(d * d <= m + 2 and (m + 2) % d = 0)"))
        .groupBy("k").agg(
          max(expr("case when d * d <= m and m % d = 0 then 1L else 0L end")).as("c1"),
          max(expr("case when d * d <= m + 2 and (m + 2) % d = 0 then 1L else 0L end")).as("c2"))
      val f = base.join(div, Seq("k"), "left")
        .withColumn("p1", expr("case when coalesce(c1, 0L) = 1L then 0L else 1L end"))
        .withColumn("p2", expr("case when coalesce(c2, 0L) = 1L then 0L else 1L end"))
        .withColumn("twin", expr("p1 * p2"))
      // Hardy–Littlewood for ODD candidates: twins live only at odd
      // positions, so the density doubles — E ≈ 2·2C₂·n/ln²(m̄) with
      // ln(5e5) e6 = 13122363 and 2C₂ e6 = 1320323 (the first draft
      // forgot the odd factor, q497's lesson repeating; the remaining
      // ~+17% measured excess is Jensen on 1/ln²m over m ∈ [5, 10⁶])
      f.agg(count(lit(1)).as("n_keys"),
          sum("p1").as("n_prime"), sum("twin").as("n_twin"),
          expr("coalesce(bit_xor(case when twin = 1L then m end), 0L)")
            .as("xor_twin_values"),
          coalesce(max(expr("case when twin = 1L then m end")), lit(0L))
            .as("largest_twin"))
        .withColumn("hl_expected_e2", expr(
          "n_keys * 2L * 1320323L * 100L div 13122363L * 1000000L div 13122363L"))
        .withColumn("measured_e2", expr("n_twin * 100L"))
        .select("n_keys", "n_prime", "n_twin", "measured_e2",
          "hl_expected_e2", "largest_twin", "xor_twin_values")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q513_fermat_pseudoprimes" -> {
      def pow2D(e: String): String =
        "(CASE " + (0 to 20).map(k => s"WHEN $e = $k THEN ${1L << k}")
          .mkString(" ") + " END)"
      s"""WITH RECURSIVE base AS (SELECT o_orderkey AS k,
        |    5 + 2 * (CAST('0x' || substr(md5('mr:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 500000) AS m
        |  FROM orders),
        |comp AS (SELECT b.k, COUNT(*) AS n_div
        |  FROM base b, (SELECT UNNEST(range(3, 1000, 2)) AS d) d
        |  WHERE d.d * d.d <= b.m AND b.m % d.d = 0
        |  GROUP BY b.k),
        |mp AS (
        |  SELECT k, m, 0::BIGINT AS j, 1::BIGINT AS x FROM base
        |  UNION ALL
        |  SELECT z.k, z.m, z.j,
        |    CASE WHEN ((z.m - 1) // ${pow2D("(19 - (z.j - 1))")}) % 2 = 1
        |      THEN ((z.x * z.x) % z.m * 2) % z.m
        |      ELSE (z.x * z.x) % z.m END
        |  FROM (SELECT r.k, r.m, r.j + 1 AS j, r.x
        |        FROM mp r WHERE r.j < 20) z),
        |fx AS (SELECT k, m, x FROM mp WHERE j = 20),
        |f AS (SELECT fx.k, fx.m,
        |    CASE WHEN fx.x = 1 THEN 1 ELSE 0 END AS fermat_pass,
        |    CASE WHEN c.n_div IS NULL THEN 1 ELSE 0 END AS is_prime
        |  FROM fx LEFT JOIN comp c ON fx.k = c.k)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(is_prime) AS BIGINT) AS n_prime,
        |  CAST(SUM(is_prime * fermat_pass) AS BIGINT) AS n_prime_pass,
        |  CAST(CASE WHEN SUM(is_prime * fermat_pass) = SUM(is_prime)
        |    THEN 1 ELSE 0 END AS BIGINT) AS flt_certificate,
        |  CAST(SUM((1 - is_prime) * fermat_pass) AS BIGINT)
        |    AS n_pseudoprimes,
        |  CAST(COALESCE(MIN(CASE WHEN is_prime = 0 AND fermat_pass = 1
        |    THEN m END), 0) AS BIGINT) AS smallest_pseudoprime,
        |  COALESCE(bit_xor(CASE WHEN is_prime = 0 AND fermat_pass = 1
        |    THEN m END), 0) AS xor_pseudoprime_values
        |FROM f""".stripMargin
    },

    "q514_twin_primes" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |    5 + 2 * (CAST('0x' || substr(md5('mr:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 500000) AS m
        |  FROM orders),
        |f AS (SELECT k, m,
        |    CASE WHEN len(list_filter(range(3, 1000, 2),
        |      d -> d * d <= m AND m % d = 0)) > 0 THEN 0 ELSE 1 END AS p1,
        |    CASE WHEN len(list_filter(range(3, 1000, 2),
        |      d -> d * d <= (m + 2) AND (m + 2) % d = 0)) > 0
        |      THEN 0 ELSE 1 END AS p2
        |  FROM base)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(p1) AS BIGINT) AS n_prime,
        |  CAST(SUM(p1 * p2) AS BIGINT) AS n_twin,
        |  CAST(SUM(p1 * p2) * 100 AS BIGINT) AS measured_e2,
        |  CAST(COUNT(*) * 2 * 1320323 * 100 // 13122363 * 1000000 // 13122363
        |    AS BIGINT) AS hl_expected_e2,
        |  CAST(COALESCE(MAX(CASE WHEN p1 * p2 = 1 THEN m END), 0) AS BIGINT)
        |    AS largest_twin,
        |  COALESCE(bit_xor(CASE WHEN p1 * p2 = 1 THEN m END), 0)
        |    AS xor_twin_values
        |FROM f""".stripMargin
  )
}
