package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Folklore-recursion wave (round 10, ninety-eighth wave): Josephus,
  * Collatz.
  *
  * q509 settles the Josephus problem (k = 2) both ways on REAL group
  * sizes — the distinct per-customer order counts: the O(n)
  * recurrence J(n) = (J(n−1) + 2) mod n folded up from J(1) = 0, and
  * the closed form J(n) = 2·(n − 2^⌊log₂n⌋) certified equal on every
  * size (1-based position 2l+1, the bit-rotation theorem). q510 runs
  * the Collatz map on ~n/14 hash-drawn odd numbers below 10⁶: every
  * trajectory reaches 1 (a certificate here, not a conjecture — the
  * range below 2⁶⁸ is machine-verified in the literature) within a
  * 600-step fold with early stop, and the census emits the stopping-
  * time distribution, the maximum excursion (certified < 2⁵⁰ so the
  * BIGINT arithmetic never wraps), and the per-key verdict xor. Both folds replay as
  * recursive CTEs and in the driver.
  */
object FolkloreQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G454: Josephus recurrence ≡ closed form on real sizes ──────────
    "q509_josephus" -> ((s, dir) => {
      val sizes = Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n0"))
        .select(col("n0").as("n")).distinct()
      // J(m) = (J(m-1) + 2) mod m, J(1) = 0; survivor position = J + 1
      val flog = "(case " + (9 to 0 by -1).map(b =>
        s"when n >= ${1L << b} then ${1L << b}L").mkString(" ") + " end)"
      sizes
        .withColumn("j_rec", expr(
          """aggregate(sequence(2, cast(n as int)), 0L,
            |  (acc, m) -> pmod(acc + 2L, cast(m as bigint)))""".stripMargin))
        .withColumn("pow2", expr(flog))
        .withColumn("j_closed", expr("2L * (n - pow2)"))
        .withColumn("agree", expr(
          "case when j_rec = j_closed then 1L else 0L end"))
        .agg(count(lit(1)).as("n_sizes"), max("n").as("n_max"),
          sum("agree").as("n_agree"),
          expr("bit_xor(md5_60(concat(cast(n as string), ':', " +
            "cast(j_rec as string))))").as("xor60_survivors"))
        .withColumn("theorem_ok", expr(
          "case when n_agree = n_sizes then 1L else 0L end"))
        .select("n_sizes", "n_max", "n_agree", "theorem_ok",
          "xor60_survivors")
    }),

    // ── G455: Collatz stopping-time census ─────────────────────────────
    "q510_collatz" -> ((s, dir) => {
      // spread: the 600-step trajectory fold below otherwise runs inside
      // the single-row-group scan's one task (guide §2.5)
      val start = graft.ops.Relational.spread(Tables.orders(s, dir))
        .filter(expr("pmod(md5_60(concat('cz:', cast(o_orderkey as string))), 14) = 0"))
        .select(col("o_orderkey").as("k"),
          expr("1L + 2L * pmod(md5_60(concat('cv:', cast(o_orderkey as string))), 500000L)")
            .as("m"))
      val fold =
        """aggregate(sequence(1, 600),
          |  named_struct('x', m, 'steps', 0L, 'peak', m),
          |  (acc, z) -> case when acc.x = 1L then acc
          |    else element_at(transform(array(
          |        case when acc.x % 2L = 0L then acc.x div 2L
          |             else 3L * acc.x + 1L end),
          |      nx -> named_struct('x', nx, 'steps', acc.steps + 1L,
          |        'peak', greatest(acc.peak, nx))), 1)
          |    end)""".stripMargin
      val run = start.withColumn("st", expr(fold))
        .select(col("k"), col("m"), expr("st.x").as("x_final"),
          expr("st.steps").as("steps"), expr("st.peak").as("peak"))
      run.agg(count(lit(1)).as("n_starts"),
          sum(expr("case when x_final = 1L then 1L else 0L end"))
            .as("n_reached_one"),
          max("steps").as("steps_max"), sum("steps").as("steps_total"),
          max("peak").as("peak_max"),
          sum(expr("case when peak < 1125899906842624L then 1L else 0L end"))
            .as("n_no_overflow_risk"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(steps as string))))").as("xor60_trajectories"))
        .withColumn("mean_steps_e2", expr("steps_total * 100 div n_starts"))
        .withColumn("all_reached_one", expr(
          "case when n_reached_one = n_starts then 1L else 0L end"))
        .select("n_starts", "n_reached_one", "all_reached_one",
          "steps_max", "mean_steps_e2", "peak_max", "n_no_overflow_risk",
          "xor60_trajectories")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q509_josephus" -> {
      val flog = "(CASE " + (9 to 0 by -1).map(b =>
        s"WHEN n >= ${1L << b} THEN ${1L << b}").mkString(" ") + " END)"
      s"""WITH RECURSIVE sizes AS (SELECT DISTINCT CAST(cnt AS BIGINT) AS n
        |  FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1)),
        |rec AS (
        |  SELECT n, 1::BIGINT AS m, 0::BIGINT AS j FROM sizes
        |  UNION ALL
        |  SELECT n, m + 1, ((j + 2) % (m + 1) + (m + 1)) % (m + 1)
        |  FROM rec WHERE m < n),
        |fin AS (SELECT r.n, r.j AS j_rec, 2 * (r.n - $flog) AS j_closed
        |  FROM rec r WHERE r.m = r.n)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sizes,
        |  CAST(MAX(n) AS BIGINT) AS n_max,
        |  CAST(SUM(CASE WHEN j_rec = j_closed THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_agree,
        |  CAST(CASE WHEN SUM(CASE WHEN j_rec = j_closed THEN 1 ELSE 0 END)
        |    = COUNT(*) THEN 1 ELSE 0 END AS BIGINT) AS theorem_ok,
        |  bit_xor(CAST('0x' || substr(md5(CAST(n AS VARCHAR) || ':' ||
        |    CAST(j_rec AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_survivors
        |FROM fin""".stripMargin
    },

    "q510_collatz" ->
      """WITH RECURSIVE start AS (SELECT o_orderkey AS k,
        |    1 + 2 * (CAST('0x' || substr(md5('cv:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 500000) AS m
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5('cz:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % 14 = 0),
        |rec AS (
        |  SELECT k, m, 0::BIGINT AS i, m AS x, 0::BIGINT AS steps, m AS peak
        |  FROM start
        |  UNION ALL
        |  SELECT z.k, z.m, z.i,
        |    CASE WHEN z.x = 1 THEN z.x ELSE z.nx END,
        |    CASE WHEN z.x = 1 THEN z.steps ELSE z.steps + 1 END,
        |    CASE WHEN z.x = 1 THEN z.peak ELSE GREATEST(z.peak, z.nx) END
        |  FROM (
        |    SELECT r.k, r.m, r.i + 1 AS i, r.x, r.steps, r.peak,
        |      CASE WHEN r.x % 2 = 0 THEN r.x // 2 ELSE 3 * r.x + 1 END AS nx
        |    FROM rec r WHERE r.i < 600) z),
        |fin AS (SELECT k, m, x AS x_final, steps, peak FROM rec WHERE i = 600)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_starts,
        |  CAST(SUM(CASE WHEN x_final = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_reached_one,
        |  CAST(CASE WHEN SUM(CASE WHEN x_final = 1 THEN 1 ELSE 0 END)
        |    = COUNT(*) THEN 1 ELSE 0 END AS BIGINT) AS all_reached_one,
        |  CAST(MAX(steps) AS BIGINT) AS steps_max,
        |  CAST(SUM(steps) * 100 // COUNT(*) AS BIGINT) AS mean_steps_e2,
        |  CAST(MAX(peak) AS BIGINT) AS peak_max,
        |  CAST(SUM(CASE WHEN peak < 1125899906842624 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_no_overflow_risk,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(steps AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_trajectories
        |FROM fin""".stripMargin
  )
}
