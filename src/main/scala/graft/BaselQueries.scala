package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Basel wave (round 10, hundred-fifth wave): π² two independent
  * ways — the 520th oracle-gated query.
  *
  * q520 computes π² inside the engine by two unrelated mathematics
  * and certifies they agree. Analytic: the Basel series Σ1/n² summed
  * exactly at e12 over n ≤ 10⁵ (each integer term floors by < 1, so
  * the truncation undercount is < 10⁵; the tail Euler solved is
  * bracketed by 1/(N+1) < Σ_{n>N} < 1/N) — giving a PROVEN interval
  * around π²/6 = 1.644934066848… that the sum must land in, and
  * does. Probabilistic: Cesàro's theorem says two random integers
  * are coprime with probability 6/π², so the gcd fold from q515 over
  * 15000 corpus-hash pairs inverts into a second π² estimate with no
  * series anywhere in it. Both derivations sit beside the literal
  * 9.8696044: the series lands inside its exact bracket, the Cesàro
  * estimate within sampling tolerance — the engine computing a
  * transcendental constant from its own order keys.
  */
object BaselQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G465: π² by Basel series AND Cesàro coprimality ────────────────
    "q520_basel_cesaro" -> ((s, dir) => {
      val basel = Tables.orders(s, dir).sparkSession.range(1, 100001)
        .agg(sum(expr("1000000000000L div (id * id)")).as("sum_e12"))
        // bracket: true partial sum ≥ floored sum; tail ∈ (1e12/(N+1), 1e12/N)
        .select(col("sum_e12"),
          expr("sum_e12 + 9999900L").as("lower_e12"),
          expr("sum_e12 + 100000L + 10000000L").as("upper_e12"))
      // spread: the 90-step Euclid fold below otherwise runs inside the
      // single-row-group scan's one task (guide §2.5)
      val gcds = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey").as("k"),
          expr("1L + pmod(md5_60(concat('ga:', cast(o_orderkey as string))), 999999L)")
            .as("a"),
          expr("1L + pmod(md5_60(concat('gb:', cast(o_orderkey as string))), 999999L)")
            .as("b"))
        .withColumn("g", expr(
          """aggregate(sequence(1, 90),
            |  named_struct('r', a, 'r2', b),
            |  (acc, z) -> case when acc.r2 = 0L then acc
            |    else named_struct('r', acc.r2, 'r2', pmod(acc.r, acc.r2)) end,
            |  f -> f.r)""".stripMargin))
      val ces = gcds.agg(count(lit(1)).as("n_pairs"),
        sum(expr("case when g = 1L then 1L else 0L end")).as("n_coprime"))
      basel.crossJoin(ces)
        .select(col("sum_e12"),
          expr("case when 1644934066848L >= lower_e12 and " +
            "1644934066848L <= upper_e12 then 1L else 0L end")
            .as("basel_bracket_ok"),
          expr("6L * sum_e12 div 1000000L").as("pi2_basel_e6"),
          col("n_pairs"), col("n_coprime"),
          expr("6000000L * n_pairs div n_coprime").as("pi2_cesaro_e6"),
          lit(9869604L).as("pi2_literal_e6"),
          expr("abs(6L * sum_e12 div 1000000L - 9869604L)")
            .as("basel_gap_e6"),
          expr("abs(6000000L * n_pairs div n_coprime - 9869604L)")
            .as("cesaro_gap_e6"),
          expr("case when abs(6000000L * n_pairs div n_coprime - 9869604L) " +
            "* 100 <= 5 * 9869604L then 1L else 0L end")
            .as("cesaro_within_5pct"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q520_basel_cesaro" ->
      """WITH RECURSIVE basel AS (SELECT SUM(1000000000000 // (n * n))
        |    AS sum_e12
        |  FROM (SELECT UNNEST(range(1, 100001)) AS n)),
        |pairs AS (SELECT o_orderkey AS k,
        |    1 + CAST('0x' || substr(md5('ga:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 999999 AS a,
        |    1 + CAST('0x' || substr(md5('gb:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 999999 AS b
        |  FROM orders),
        |rec AS (
        |  SELECT k, 0::BIGINT AS i, a AS r, b AS r2 FROM pairs
        |  UNION ALL
        |  SELECT z.k, z.i,
        |    CASE WHEN z.stay = 1 THEN z.r ELSE z.r2 END,
        |    CASE WHEN z.stay = 1 THEN z.r2 ELSE z.r % z.r2 END
        |  FROM (SELECT r.k, r.i + 1 AS i, r.r, r.r2,
        |      CASE WHEN r.r2 = 0 THEN 1 ELSE 0 END AS stay
        |    FROM rec r WHERE r.i < 90) z),
        |ces AS (SELECT COUNT(*) AS n_pairs,
        |    SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n_coprime
        |  FROM rec WHERE i = 90)
        |SELECT CAST(b.sum_e12 AS BIGINT) AS sum_e12,
        |  CAST(CASE WHEN 1644934066848 >= b.sum_e12 + 9999900
        |    AND 1644934066848 <= b.sum_e12 + 100000 + 10000000
        |    THEN 1 ELSE 0 END AS BIGINT) AS basel_bracket_ok,
        |  CAST(6 * b.sum_e12 // 1000000 AS BIGINT) AS pi2_basel_e6,
        |  CAST(c.n_pairs AS BIGINT) AS n_pairs,
        |  CAST(c.n_coprime AS BIGINT) AS n_coprime,
        |  CAST(6000000 * c.n_pairs // c.n_coprime AS BIGINT)
        |    AS pi2_cesaro_e6,
        |  CAST(9869604 AS BIGINT) AS pi2_literal_e6,
        |  CAST(ABS(6 * b.sum_e12 // 1000000 - 9869604) AS BIGINT)
        |    AS basel_gap_e6,
        |  CAST(ABS(6000000 * c.n_pairs // c.n_coprime - 9869604) AS BIGINT)
        |    AS cesaro_gap_e6,
        |  CAST(CASE WHEN ABS(6000000 * c.n_pairs // c.n_coprime - 9869604)
        |    * 100 <= 5 * 9869604 THEN 1 ELSE 0 END AS BIGINT)
        |    AS cesaro_within_5pct
        |FROM basel b, ces c""".stripMargin
  )
}
