package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Euclid wave (round 10, hundred-second wave): extended GCD with
  * Bézout and Lamé certificates, Zeckendorf representations.
  *
  * q515 runs the extended Euclidean algorithm on real key pairs
  * (consecutive hash-ranked order keys): the fold carries
  * (r, r', s, s', t, t') and stops at r' = 0, and three classics are
  * counted rather than cited — the output divides both inputs AND
  * the Bézout identity a·s + b·t = g holds EXACTLY on every pair
  * (the two together certify it IS the gcd: a common divisor that
  * is an integer combination divides every common divisor), and
  * Lamé's 1844 theorem bounds the step count by 5× the decimal
  * digits of the smaller input (the Fibonacci worst case — the first
  * theorem ever proved about an algorithm's running time). q516
  * builds each candidate's Zeckendorf representation (greedy largest
  * Fibonacci first) and certifies the theorem's clauses: the parts
  * sum back to n exactly, no two chosen Fibonacci numbers are
  * adjacent (the greedy residual is always strictly below the next
  * Fibonacci down), and the representation length sits near
  * n's index-of-φ logarithm. Both folds replay in the driver.
  */
object EuclidQueries {

  private val Fibs: Seq[Long] = {
    val b = scala.collection.mutable.ArrayBuffer(1L, 2L)
    while (b.last < 2000000L) b += b(b.size - 1) + b(b.size - 2)
    b.toSeq // 1, 2, 3, 5, ... (Zeckendorf basis, no duplicate 1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G460: extended Euclid — Bézout + Lamé, counted ─────────────────
    "q515_euclid_bezout" -> ((s, dir) => {
      val pairs = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("1L + pmod(md5_60(concat('ga:', cast(o_orderkey as string))), 999999L)")
            .as("a"),
          expr("1L + pmod(md5_60(concat('gb:', cast(o_orderkey as string))), 999999L)")
            .as("b"))
      // one codegen'd kernel call per row (graft.plans.EgcdKernel —
      // semantics identical to the old 90-step capped fold, which was
      // interpreted and cost this query its last 3 s of bench)
      val digits = "(case when least(a, b) >= 100000L then 6L " +
        "when least(a, b) >= 10000L then 5L when least(a, b) >= 1000L then 4L " +
        "when least(a, b) >= 100L then 3L when least(a, b) >= 10L then 2L " +
        "else 1L end)"
      val run = pairs.withColumn("st", expr("egcd90(a, b)"))
        .select(col("k"), col("a"), col("b"),
          expr("element_at(st, 1)").as("g"), expr("element_at(st, 2)").as("bz_s"),
          expr("element_at(st, 3)").as("bz_t"), expr("element_at(st, 4)").as("steps"),
          expr(s"$digits").as("nd"))
        .withColumn("divides_ok", expr(
          "case when a % g = 0L and b % g = 0L then 1L else 0L end"))
        .withColumn("bezout_ok", expr(
          "case when a * bz_s + b * bz_t = g then 1L else 0L end"))
        .withColumn("lame_ok", expr(
          "case when steps <= 5L * nd then 1L else 0L end"))
      run.agg(count(lit(1)).as("n_pairs"),
          sum("divides_ok").as("n_divides_ok"),
          sum("bezout_ok").as("n_bezout_ok"),
          sum("lame_ok").as("n_lame_ok"),
          max("steps").as("steps_max"), sum("steps").as("steps_total"),
          sum(expr("case when g = 1L then 1L else 0L end")).as("n_coprime"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(g as string))))").as("xor60_gcds"))
        .withColumn("mean_steps_e2", expr("steps_total * 100 div n_pairs"))
        .withColumn("coprime_e4", expr("n_coprime * 10000 div n_pairs"))
        // 6/π² ≈ 0.6079: the coprimality density, for flavor
        .withColumn("coprime_theory_e4", lit(6079L))
        .select("n_pairs", "n_divides_ok", "n_bezout_ok", "n_lame_ok",
          "steps_max", "mean_steps_e2", "n_coprime", "coprime_e4",
          "coprime_theory_e4", "xor60_gcds")
    }),

    // ── G461: Zeckendorf greedy representation ─────────────────────────
    "q516_zeckendorf" -> ((s, dir) => {
      // spread: the 25-flag greedy chain below otherwise runs inside the
      // single-row-group scan's one task (guide §2.5)
      val nums = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey").as("k"),
          expr("1L + pmod(md5_60(concat('zk:', cast(o_orderkey as string))), 1000000L)")
            .as("n"))
      // greedy largest-fib-first as CHAINED SCALAR COLUMNS (one take
      // flag + one residual update per fib, all whole-stage codegen) —
      // the r10 draft folded with per-step array concat (interpreted +
      // 29 allocations per row = 7 s of bench). ti = take flag for
      // Fibs(i) (ascending index, so adjacency reads t_i·t_{i+1}).
      val desc = Fibs.zipWithIndex.reverse
      val run0 = desc.foldLeft(nums.withColumn("rem", col("n"))) {
        case (d, (f, i)) =>
          d.withColumn(s"t$i", expr(s"case when rem >= ${f}L then 1L else 0L end"))
            .withColumn("rem", expr(s"rem - t$i * ${f}L"))
      }
      val nIdx = Fibs.indices
      val run = run0
        .withColumn("n_parts", expr(nIdx.map(i => s"t$i").mkString(" + ")))
        .withColumn("sum_ok", expr(
          s"case when (${nIdx.map(i => s"t$i * ${Fibs(i)}L").mkString(" + ")}) = n " +
            "then 1L else 0L end"))
        .withColumn("n_adjacent", expr(
          nIdx.init.map(i => s"t$i * t${i + 1}").mkString(" + ")))
      run.agg(count(lit(1)).as("n_nums"),
          sum("sum_ok").as("n_sum_ok"),
          sum(expr("case when n_adjacent = 0L then 1L else 0L end"))
            .as("n_nonadjacent"),
          max("n_parts").as("parts_max"), sum("n_parts").as("parts_total"),
          expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
            "cast(n_parts as string))))").as("xor60_reprs"))
        .withColumn("zeckendorf_ok", expr(
          "case when n_sum_ok = n_nums and n_nonadjacent = n_nums " +
            "then 1L else 0L end"))
        .withColumn("mean_parts_e2", expr("parts_total * 100 div n_nums"))
        .select("n_nums", "n_sum_ok", "n_nonadjacent", "zeckendorf_ok",
          "parts_max", "mean_parts_e2", "xor60_reprs")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q515_euclid_bezout" -> {
      val digits = "(CASE WHEN LEAST(a, b) >= 100000 THEN 6 " +
        "WHEN LEAST(a, b) >= 10000 THEN 5 WHEN LEAST(a, b) >= 1000 THEN 4 " +
        "WHEN LEAST(a, b) >= 100 THEN 3 WHEN LEAST(a, b) >= 10 THEN 2 " +
        "ELSE 1 END)"
      s"""WITH RECURSIVE pairs AS (SELECT o_orderkey AS k,
        |    1 + CAST('0x' || substr(md5('ga:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 999999 AS a,
        |    1 + CAST('0x' || substr(md5('gb:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 999999 AS b
        |  FROM orders),
        |rec AS (
        |  SELECT k, a, b, 0::BIGINT AS i, a AS r, b AS r2, 1::BIGINT AS s,
        |    0::BIGINT AS s2, 0::BIGINT AS t, 1::BIGINT AS t2,
        |    0::BIGINT AS steps
        |  FROM pairs
        |  UNION ALL
        |  SELECT z.k, z.a, z.b, z.i,
        |    CASE WHEN z.stay = 1 THEN z.r ELSE z.r2 END,
        |    CASE WHEN z.stay = 1 THEN z.r2 ELSE z.r - z.q * z.r2 END,
        |    CASE WHEN z.stay = 1 THEN z.s ELSE z.s2 END,
        |    CASE WHEN z.stay = 1 THEN z.s2 ELSE z.s - z.q * z.s2 END,
        |    CASE WHEN z.stay = 1 THEN z.t ELSE z.t2 END,
        |    CASE WHEN z.stay = 1 THEN z.t2 ELSE z.t - z.q * z.t2 END,
        |    CASE WHEN z.stay = 1 THEN z.steps ELSE z.steps + 1 END
        |  FROM (
        |    SELECT r.k, r.a, r.b, r.i + 1 AS i, r.r, r.r2, r.s, r.s2,
        |      r.t, r.t2, r.steps,
        |      CASE WHEN r.r2 = 0 THEN 1 ELSE 0 END AS stay,
        |      CASE WHEN r.r2 = 0 THEN 0 ELSE r.r // r.r2 END AS q
        |    FROM rec r WHERE r.i < 90) z),
        |fin AS (SELECT k, a, b, r AS g, s AS bz_s, t AS bz_t, steps,
        |    $digits AS nd
        |  FROM rec WHERE i = 90)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN a % g = 0 AND b % g = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_divides_ok,
        |  CAST(SUM(CASE WHEN a * bz_s + b * bz_t = g THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bezout_ok,
        |  CAST(SUM(CASE WHEN steps <= 5 * nd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lame_ok,
        |  CAST(MAX(steps) AS BIGINT) AS steps_max,
        |  CAST(SUM(steps) * 100 // COUNT(*) AS BIGINT) AS mean_steps_e2,
        |  CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_coprime,
        |  CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
        |    AS BIGINT) AS coprime_e4,
        |  CAST(6079 AS BIGINT) AS coprime_theory_e4,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(g AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_gcds
        |FROM fin""".stripMargin
    },

    "q516_zeckendorf" -> {
      val fibDesc = Fibs.reverse.mkString(", ")
      val fibAsc = Fibs.mkString(", ")
      s"""WITH RECURSIVE nums AS (SELECT o_orderkey AS k,
        |    1 + CAST('0x' || substr(md5('zk:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 1000000 AS n
        |  FROM orders),
        |grec AS (
        |  SELECT k, n, 0::BIGINT AS j, n AS rem, []::BIGINT[] AS tk FROM nums
        |  UNION ALL
        |  SELECT z.k, z.n, z.j,
        |    CASE WHEN z.take = 1 THEN z.rem - z.f ELSE z.rem END,
        |    list_concat(z.tk, [CAST(z.take AS BIGINT)])
        |  FROM (SELECT g.k, g.n, g.j + 1 AS j, g.rem, g.tk,
        |      ([$fibDesc])[CAST(g.j + 1 AS INT)] AS f,
        |      CASE WHEN g.rem >= ([$fibDesc])[CAST(g.j + 1 AS INT)]
        |        THEN 1 ELSE 0 END AS take
        |    FROM grec g WHERE g.j < ${Fibs.size}) z),
        |greedy AS (SELECT k, n, list_reverse(tk) AS taken
        |  FROM grec WHERE j = ${Fibs.size}),
        |chk AS (SELECT k, n, taken,
        |    list_sum(list_transform(range(1, ${Fibs.size + 1}),
        |      i -> taken[CAST(i AS INT)] * ([$fibAsc])[CAST(i AS INT)]))
        |      AS sum_back,
        |    list_sum(taken) AS n_parts,
        |    len(list_filter(range(1, ${Fibs.size}), i ->
        |      taken[CAST(i AS INT)] = 1 AND taken[CAST(i AS INT) + 1] = 1))
        |      AS n_adjacent
        |  FROM greedy)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_nums,
        |  CAST(SUM(CASE WHEN sum_back = n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sum_ok,
        |  CAST(SUM(CASE WHEN n_adjacent = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonadjacent,
        |  CAST(CASE WHEN SUM(CASE WHEN sum_back = n THEN 1 ELSE 0 END)
        |      = COUNT(*)
        |    AND SUM(CASE WHEN n_adjacent = 0 THEN 1 ELSE 0 END) = COUNT(*)
        |    THEN 1 ELSE 0 END AS BIGINT) AS zeckendorf_ok,
        |  CAST(MAX(n_parts) AS BIGINT) AS parts_max,
        |  CAST(SUM(n_parts) * 100 // COUNT(*) AS BIGINT) AS mean_parts_e2,
        |  bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |    CAST(n_parts AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_reprs
        |FROM chk""".stripMargin
    }
  )
}
