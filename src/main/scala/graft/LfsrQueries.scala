package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LFSR wave (round 10, ninety-seventh wave): maximal period by
  * Lagrange's theorem.
  *
  * q508 certifies that the 16-bit Galois LFSR with taps 0xB400 (the
  * primitive polynomial x¹⁶+x¹⁴+x¹³+x¹¹+1 — the classic PRNG/scramb-
  * ler register) has EXACTLY period 65535 from every tested seed,
  * without tracking 65535 visited states: the orbit length divides
  * the group order 65535 = 3·5·17·257 (Lagrange), so period = 65535
  * iff x returns to the seed at 65535 AND differs from it at the
  * four maximal proper divisors 65535/p = 21845, 13107, 3855, 255.
  * One 65535-step fold per seed carries the state and snapshots it
  * at those five checkpoints; 16 hash-drawn nonzero seeds from order
  * keys all certify, plus the step-function sanity (state never 0,
  * always < 2¹⁶). The same 65535-step recursion runs in DuckDB, and
  * the driver replays one full orbit imperatively.
  */
object LfsrQueries {

  private val Taps = 46080L // 0xB400
  private val Checks = Seq(255L, 3855L, 13107L, 21845L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G453: LFSR maximal-period certificate ──────────────────────────
    "q508_lfsr_period" -> ((s, dir) => {
      val step = s"((acc.x div 2L) ^ ((acc.x % 2L) * ${Taps}L))"
      val snaps = Checks.map(c => s"'c$c', case when z = ${c}L then " +
        s"$step else acc.c$c end")
        .mkString(",\n|    ")
      val fold =
        s"""aggregate(sequence(1, 65535),
           |  named_struct('x', seed, ${Checks.map(c => s"'c$c', 0L")
              .mkString(", ")}, 'bad', 0L),
           |  (acc, z) -> named_struct(
           |    'x', $step,
           |    $snaps,
           |    'bad', acc.bad + (case when $step = 0L or $step >= 65536L
           |      then 1L else 0L end)))""".stripMargin
      val seeds = Tables.orders(s, dir)
        .filter(expr("pmod(md5_60(concat('sd:', cast(o_orderkey as string))), " +
          "937) = 0"))
        .select(col("o_orderkey").as("k"),
          expr("pmod(md5_60(concat('seed:', cast(o_orderkey as string))), " +
            "65535) + 1").as("seed"))
      val run = seeds.withColumn("st", expr(fold))
        .select(col("k"), col("seed"),
          expr("st.x").as("x_full"),
          expr("st.bad").as("n_range_violations"),
          expr("case when st.x = seed then 1L else 0L end").as("returns"),
          expr("case when " + Checks.map(c => s"st.c$c != seed")
            .mkString(" and ") + " then 1L else 0L end").as("divisors_clear"))
      run.agg(count(lit(1)).as("n_seeds"),
          sum("returns").as("n_return_at_65535"),
          sum("divisors_clear").as("n_divisors_clear"),
          sum(expr("returns * divisors_clear")).as("n_period_exact"),
          sum("n_range_violations").as("n_range_violations"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(seed as string))))").as("xor60_seeds"))
        .withColumn("maximal_period_cert", expr(
          "case when n_period_exact = n_seeds then 1L else 0L end"))
        .select("n_seeds", "n_return_at_65535", "n_divisors_clear",
          "n_period_exact", "maximal_period_cert", "n_range_violations",
          "xor60_seeds")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q508_lfsr_period" ->
      s"""WITH RECURSIVE seeds AS (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5('seed:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 65535 + 1 AS seed
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('sd:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % 937 = 0),
        |rec AS (
        |  SELECT k, seed, 0::BIGINT AS i, seed AS x,
        |    ${Checks.map(c => s"0::BIGINT AS c$c").mkString(", ")},
        |    0::BIGINT AS bad
        |  FROM seeds
        |  UNION ALL
        |  SELECT z.k, z.seed, z.i, z.nx,
        |    ${Checks.map(c =>
             s"CASE WHEN z.i = $c THEN z.nx ELSE z.c$c END").mkString(",\n|    ")},
        |    z.bad + (CASE WHEN z.nx = 0 OR z.nx >= 65536 THEN 1 ELSE 0 END)
        |  FROM (
        |    SELECT r.k, r.seed, r.i + 1 AS i,
        |      xor(r.x // 2, (r.x % 2) * $Taps) AS nx,
        |      ${Checks.map(c => s"r.c$c").mkString(", ")}, r.bad
        |    FROM rec r WHERE r.i < 65535) z),
        |fin AS (SELECT k, seed, x,
        |    ${Checks.map(c => s"c$c").mkString(", ")}, bad
        |  FROM rec WHERE i = 65535),
        |per AS (SELECT k, seed, bad,
        |    CASE WHEN x = seed THEN 1 ELSE 0 END AS returns,
        |    CASE WHEN ${Checks.map(c => s"c$c != seed").mkString(" AND ")}
        |      THEN 1 ELSE 0 END AS divisors_clear
        |  FROM fin)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds,
        |  CAST(SUM(returns) AS BIGINT) AS n_return_at_65535,
        |  CAST(SUM(divisors_clear) AS BIGINT) AS n_divisors_clear,
        |  CAST(SUM(returns * divisors_clear) AS BIGINT) AS n_period_exact,
        |  CAST(CASE WHEN SUM(returns * divisors_clear) = COUNT(*)
        |    THEN 1 ELSE 0 END AS BIGINT) AS maximal_period_cert,
        |  CAST(SUM(bad) AS BIGINT) AS n_range_violations,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(seed AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_seeds
        |FROM per""".stripMargin
  )
}
