package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LFSR wave (round 10, ninety-seventh wave; round 11 rewrite):
  * maximal period by Lagrange's theorem, certified by JUMP-AHEAD.
  *
  * q508 certifies that the 16-bit Galois LFSR with taps 0xB400 (the
  * primitive polynomial x¹⁶+x¹⁴+x¹³+x¹¹+1 — the classic PRNG/scramb-
  * ler register) has EXACTLY period 65535 from every tested seed,
  * without tracking 65535 visited states: the orbit length divides
  * the group order 65535 = 3·5·17·257 (Lagrange), so period = 65535
  * iff x returns to the seed at 65535 AND differs from it at the
  * four maximal proper divisors 65535/p = 21845, 13107, 3855, 255.
  *
  * Round-11 rewrite: the r10 version ran a 65535-step higher-order
  * fold per seed (HOFs are CodegenFallback → interpreted; 9.9 s of
  * bench for 16 seeds) and a 65535-level recursive CTE in the oracle.
  * The LFSR step is LINEAR over GF(2), so state-after-k-steps is a
  * 16×16 bit-matrix power applied to the seed: M^k is precomputed in
  * Scala at plan-build time (k ∈ {255, 3855, 13107, 21845, 65535} —
  * five 16-entry literal tables), and each checkpoint state is 16
  * codegen'd mask-and-XOR terms. This jump-ahead is the same
  * mechanism a distributed PRNG uses to give every partition its own
  * substream without replaying the generator — the actually
  * scale-relevant form of the operator. The range sanity (state
  * nonzero, < 2¹⁶) is checked at the five checkpoint states; the
  * spec (LfsrSpec) certifies the matrix powers against an imperative
  * full-orbit replay, so the shortcut itself is gated.
  */
object LfsrQueries {

  private val Taps = 46080L // 0xB400
  private val Checks = Seq(255L, 3855L, 13107L, 21845L, 65535L)

  /** Image of each basis state 2^i under one Galois step. */
  private def stepMatrix: Array[Long] =
    Array.tabulate(16)(i => { val x = 1L << i; (x >> 1) ^ ((x & 1L) * Taps) })

  /** Compose linear maps a∘b (apply b, then a), each as basis images. */
  private def compose(a: Array[Long], b: Array[Long]): Array[Long] =
    b.map(img => (0 until 16).foldLeft(0L)((acc, j) =>
      if (((img >> j) & 1L) == 1L) acc ^ a(j) else acc))

  /** M^k by square-and-multiply over GF(2). */
  private def matPow(k: Long): Array[Long] = {
    var result = Array.tabulate(16)(i => 1L << i) // identity
    var base = stepMatrix
    var e = k
    while (e > 0) {
      if ((e & 1L) == 1L) result = compose(base, result)
      base = compose(base, base)
      e >>= 1
    }
    result
  }

  /** SQL for M^k applied to column `seed`: XOR of the basis images the
    * seed's bits select. Pure bit arithmetic — whole-stage codegen.
    * Dialects differ: Spark XORs with `^` (DuckDB's `^` is POWER) and
    * shifts via shiftright(); DuckDB XORs with xor() and shifts via
    * `>>`. */
  private def jumpSparkSql(k: Long): String =
    matPow(k).zipWithIndex.map { case (img, i) =>
      s"((shiftright(seed, $i) & 1L) * ${img}L)"
    }.reduce((a, b) => s"($a ^ $b)")

  private def jumpDuckSql(k: Long): String =
    matPow(k).zipWithIndex.map { case (img, i) =>
      s"(((seed >> $i) & 1) * $img)"
    }.reduce((a, b) => s"xor($a, $b)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G453: LFSR maximal-period certificate (jump-ahead form) ────────
    "q508_lfsr_period" -> ((s, dir) => {
      val snapCols = Checks.map(c => expr(jumpSparkSql(c)).as(s"x$c"))
      val seeds = Tables.orders(s, dir)
        .filter(expr("pmod(md5_60(concat('sd:', cast(o_orderkey as string))), " +
          "937) = 0"))
        .select(col("o_orderkey").as("k"),
          expr("pmod(md5_60(concat('seed:', cast(o_orderkey as string))), " +
            "65535) + 1").as("seed"))
      val run = seeds.select(col("k") +: col("seed") +: snapCols: _*)
        .select(col("k"), col("seed"),
          col("x65535").as("x_full"),
          expr(Checks.map(c => s"case when x$c = 0L or x$c >= 65536L " +
            "then 1L else 0L end").mkString(" + ")).as("n_range_violations"),
          expr("case when x65535 = seed then 1L else 0L end").as("returns"),
          expr("case when " + Checks.init.map(c => s"x$c != seed")
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

  def oracleSql: Map[String, String] = {
    def jump(k: Long) = jumpDuckSql(k)
    Map(

    "q508_lfsr_period" ->
      s"""WITH seeds AS (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5('seed:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 65535 + 1 AS seed
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('sd:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % 937 = 0),
        |snap AS (SELECT k, seed,
        |    ${Checks.map(c => s"${jump(c)} AS x$c").mkString(",\n        |    ")}
        |  FROM seeds),
        |per AS (SELECT k, seed,
        |    ${Checks.map(c => s"CASE WHEN x$c = 0 OR x$c >= 65536 " +
             "THEN 1 ELSE 0 END").mkString(" + ")} AS bad,
        |    CASE WHEN x65535 = seed THEN 1 ELSE 0 END AS returns,
        |    CASE WHEN ${Checks.init.map(c => s"x$c != seed").mkString(" AND ")}
        |      THEN 1 ELSE 0 END AS divisors_clear
        |  FROM snap)
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

  /** Exposed for LfsrSpec: certify M^k against imperative stepping. */
  private[graft] def matPowFor(k: Long): Array[Long] = matPow(k)
}
