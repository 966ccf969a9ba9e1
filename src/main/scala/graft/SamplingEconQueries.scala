package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling-economics wave (round 10, seventy-fourth wave):
  * Hoeffding/empirical-Bernstein sample bounds, the quantizer
  * bit-width sweep, and a Simpson's-paradox census.
  *
  * q457 answers the 100-TB profiler's first question — how big a
  * sample buys ±ε on a mean — with the two classic finite-sample
  * bounds: Hoeffding (range-based) and empirical-Bernstein
  * (Maurer–Pontil 2009, variance-adaptive). Both half-widths are
  * exact-integer except one floor-sqrt each, with ln(2/δ) a design
  * literal (δ = 0.01 → 5298317 at e6) and the sqrt argument kept
  * under 2⁵³ BEFORE the one double op (the precision cliff the
  * one-op rule exists for). The TRUE mean is known, so coverage is
  * observed, not assumed, and EB's variance-adaptivity is measured
  * against Hoeffding's range pessimism. q460 sweeps the uniform
  * symmetric quantizer over 2/4/6/8 bits on the e6 embedding values
  * in ONE scan (all four SSEs as parallel aggregates, unpivoted),
  * certifies MSE strictly decreasing and the per-value truncation
  * bound |err| ≤ step, and emits the 2-bit MSE ratios the 6dB/bit
  * law predicts ≈ 16. q461 runs the Simpson's-paradox census over
  * all 300 nation pairs: overall mean-price direction vs the
  * five priority-stratum directions, every comparison an exact
  * cross-multiplied sign — full reversals (all strata disagree with
  * the aggregate) and majority flips counted, the strongest
  * full-reversal pair emitted (−1 sentinel when the corpus has
  * none — the honest usual answer).
  */
object SamplingEconQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G402: Hoeffding vs empirical-Bernstein sampling bounds ─────────
    // Sample: md5(okey) mod 64 = 0 (~1.6 %). Domain bound [0, 6e7]
    // cents is a DESIGN constant (profilers know the schema bound);
    // the spec asserts the data respects it. SS = n·Σx² − (Σx)²
    // DECIMAL-lifted; EB = √(2V̂ln(2/δ)/n) + 7(b−a)ln(2/δ)/(3(n−1)).
    "q457_hoeffding_sample" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("x"))
        .withColumn("insamp", expr(
          "case when pmod(md5_60(cast(k as string)), 64) = 0 then 1L else 0L end"))
      val pop = o.agg(count(lit(1)).as("n_pop"), sum("x").as("sx_pop"))
      val samp = o.filter(col("insamp") === 1L)
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(expr(s"cast(x as $dec) * x")).as("sxx"))
      samp.crossJoin(broadcast(pop))
        .withColumn("true_mean_cents", expr("sx_pop div n_pop"))
        .withColumn("sample_mean_cents", expr("sx div n"))
        // Hoeffding: (b−a)·√(ln(2/δ)/(2n)); arg scaled e12 → /1e6 outside
        .withColumn("hoeff_hw_cents", expr(
          """60000000L * cast(floor(sqrt(cast(
            |  5298317000000L div (2 * n) as double))) as bigint)
            |div 1000000""".stripMargin))
        // EB term1: √(2·ln_e6·SS div (n²(n−1)·1e6)) — ONE division with
        // the 1e6 folded into the denominator: Spark's decimal `div`
        // returns BIGINT, and the two-step quotient (≈9.8e18 here)
        // silently wraps past Long.MaxValue while DuckDB's HUGEINT //
        // doesn't — sqrt(negative) → NaN → 0. Engine-parity trap:
        // keep every decimal div's QUOTIENT under 2⁶³, not just the
        // operands under 10³⁸.
        .withColumn("ss", expr(s"n * sxx - cast(sx as $dec) * sx"))
        .withColumn("eb_t1", expr(
          s"""cast(floor(sqrt(cast(
             |  2 * 5298317 * ss
             |    div (cast(n as $dec) * n * (n - 1) * 1000000)
             |  as double))) as bigint)""".stripMargin))
        .withColumn("eb_t2", expr(
          "7 * 60000000L * 5298317 div (3 * (n - 1) * 1000000)"))
        .withColumn("eb_hw_cents", expr("eb_t1 + eb_t2"))
        .select(col("n_pop"), col("n"), col("true_mean_cents"),
          col("sample_mean_cents"), col("hoeff_hw_cents"),
          col("eb_t1"), col("eb_t2"), col("eb_hw_cents"),
          expr("case when abs(sample_mean_cents - true_mean_cents) " +
            "<= hoeff_hw_cents then 1L else 0L end").as("hoeff_covers"),
          expr("case when abs(sample_mean_cents - true_mean_cents) " +
            "<= eb_hw_cents then 1L else 0L end").as("eb_covers"),
          expr("case when eb_hw_cents < hoeff_hw_cents then 1L else 0L end")
            .as("eb_tighter"))
    }),

    // ── G403: uniform-quantizer bit-width sweep (rate–distortion) ──────
    "q460_bitwidth_sweep" -> ((s, dir) => {
      val dec = "decimal(38, 0)"
      val vals = Tables.embeddings(s, dir)
        .select(explode(expr(
          "transform(cast(embedding as array<double>), " +
            "x -> cast(round(x * 1000000) as bigint))")).as("x6"))
      val widths = Seq(2, 4, 6, 8).map(b => (b, (1L << (b - 1)) - 1))
      val aggs = widths.flatMap { case (b, sb) =>
        val err = s"(x6 - (x6 * $sb div 1000000) * 1000000 div $sb)"
        Seq(
          sum(expr(s"cast($err as $dec) * $err")).as(s"sse_$b"),
          max(expr(s"abs($err)")).as(s"maxe_$b"))
      }
      val one = vals.agg(count(lit(1)).as("n_vals"), aggs: _*)
      val rows = widths.map { case (b, sb) =>
        one.select(lit(b.toLong).as("bits"), lit(sb).as("levels"),
          col("n_vals"),
          expr(s"cast(sse_$b div n_vals as bigint)").as("mse"),
          col(s"maxe_$b").as("max_abs_err"),
          expr(s"cast(1000000L div $sb as bigint)").as("step"),
          expr(s"case when maxe_$b <= 1000000L div $sb then 1L else 0L end")
            .as("step_bound_ok"))
      }
      val base = rows.reduce(_ unionByName _)
      val nxt = base.select(expr("bits - 2").as("bits"),
        col("mse").as("mse_next"))
      base.join(broadcast(nxt), Seq("bits"), "left")
        .withColumn("ratio_e2", expr(
          "case when mse_next > 0 then mse * 100 div mse_next else 0L end"))
        .select("bits", "levels", "n_vals", "mse", "max_abs_err", "step",
          "step_bound_ok", "ratio_e2")
        .orderBy("bits")
    }),

    // ── G404: Simpson's-paradox census over nation pairs ───────────────
    "q461_simpsons_paradox" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderpriority").as("pri"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("x"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("g"))
      val cell = o.join(c, "o_custkey").groupBy("g", "pri")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val tot = cell.groupBy("g").agg(sum("n").as("n"), sum("sx").as("sx"))
      val pairsTot = tot.as("a").join(tot.as("b"),
          col("a.g") < col("b.g"))
        .select(col("a.g").as("ga"), col("b.g").as("gb"),
          expr("""case when a.sx * b.n > b.sx * a.n then 1L
                 |     when a.sx * b.n < b.sx * a.n then -1L
                 |     else 0L end""".stripMargin).as("s_all"),
          expr("abs(a.sx * b.n - b.sx * a.n) div (a.n * b.n)").as("gap_cents"))
      val pairsStr = cell.as("a").join(cell.as("b"),
          col("a.g") < col("b.g") && col("a.pri") === col("b.pri"))
        .select(col("a.g").as("ga"), col("b.g").as("gb"),
          expr("""case when a.sx * b.n > b.sx * a.n then 1L
                 |     when a.sx * b.n < b.sx * a.n then -1L
                 |     else 0L end""".stripMargin).as("s_k"))
        .groupBy("ga", "gb")
        .agg(count(lit(1)).as("n_strata"),
          sum(expr("case when s_k = 1L then 1L else 0L end")).as("n_up"),
          sum(expr("case when s_k = -1L then 1L else 0L end")).as("n_down"))
      val census = pairsTot.join(pairsStr, Seq("ga", "gb"))
        .withColumn("full_paradox", expr(
          """case when (s_all = 1L and n_down = n_strata)
            |       or (s_all = -1L and n_up = n_strata) then 1L
            |  else 0L end""".stripMargin))
        .withColumn("majority_flip", expr(
          """case when (s_all = 1L and n_down * 2 > n_strata)
            |       or (s_all = -1L and n_up * 2 > n_strata) then 1L
            |  else 0L end""".stripMargin))
      val strongest = census.filter(col("full_paradox") === 1L)
        .agg(coalesce(max_by(expr("ga * 100 + gb"),
          expr("struct(gap_cents, -(ga * 100 + gb))")), lit(-1L))
          .as("strongest_pair"))
      census.agg(count(lit(1)).as("n_pairs"),
          max("n_strata").as("n_strata"),
          sum("full_paradox").as("n_full_paradox"),
          sum("majority_flip").as("n_majority_flip"),
          sum(expr("case when s_all = 0L then 1L else 0L end")).as("n_exact_ties"))
        .crossJoin(broadcast(strongest))
        .select("n_pairs", "n_strata", "n_full_paradox", "n_majority_flip",
          "n_exact_ties", "strongest_pair")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q457_hoeffding_sample" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % 64 = 0 THEN 1 ELSE 0 END AS insamp
        |  FROM orders),
        |pop AS (SELECT COUNT(*) AS n_pop, SUM(x) AS sx_pop FROM o),
        |samp AS (SELECT COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx FROM o WHERE insamp = 1),
        |d AS (SELECT n_pop, n, sx_pop // n_pop AS true_mean_cents,
        |    sx // n AS sample_mean_cents,
        |    60000000 * CAST(FLOOR(SQRT(CAST(
        |      5298317000000 // (2 * n) AS DOUBLE))) AS BIGINT) // 1000000
        |      AS hoeff_hw_cents,
        |    CAST(FLOOR(SQRT(CAST(
        |      2 * 5298317 * (n * sxx - CAST(sx AS HUGEINT) * sx)
        |        // (CAST(n AS HUGEINT) * n * (n - 1) * 1000000)
        |      AS DOUBLE))) AS BIGINT) AS eb_t1,
        |    7::BIGINT * 60000000 * 5298317 // (3 * (n - 1) * 1000000) AS eb_t2
        |  FROM samp, pop)
        |SELECT CAST(n_pop AS BIGINT) AS n_pop, CAST(n AS BIGINT) AS n,
        |  CAST(true_mean_cents AS BIGINT) AS true_mean_cents,
        |  CAST(sample_mean_cents AS BIGINT) AS sample_mean_cents,
        |  CAST(hoeff_hw_cents AS BIGINT) AS hoeff_hw_cents,
        |  CAST(eb_t1 AS BIGINT) AS eb_t1, CAST(eb_t2 AS BIGINT) AS eb_t2,
        |  CAST(eb_t1 + eb_t2 AS BIGINT) AS eb_hw_cents,
        |  CAST(CASE WHEN ABS(sample_mean_cents - true_mean_cents)
        |    <= hoeff_hw_cents THEN 1 ELSE 0 END AS BIGINT) AS hoeff_covers,
        |  CAST(CASE WHEN ABS(sample_mean_cents - true_mean_cents)
        |    <= eb_t1 + eb_t2 THEN 1 ELSE 0 END AS BIGINT) AS eb_covers,
        |  CAST(CASE WHEN eb_t1 + eb_t2 < hoeff_hw_cents THEN 1 ELSE 0 END
        |    AS BIGINT) AS eb_tighter
        |FROM d""".stripMargin,

    "q460_bitwidth_sweep" -> {
      val arms = Seq(2, 4, 6, 8).map { b =>
        val sb = (1L << (b - 1)) - 1
        val err = s"(x6 - (x6 * $sb // 1000000) * 1000000 // $sb)"
        s"""SELECT $b::BIGINT AS bits, $sb::BIGINT AS levels,
           |  CAST(COUNT(*) AS BIGINT) AS n_vals,
           |  CAST(SUM(CAST($err AS HUGEINT) * $err) // COUNT(*) AS BIGINT)
           |    AS mse,
           |  CAST(MAX(ABS($err)) AS BIGINT) AS max_abs_err,
           |  CAST(1000000 // $sb AS BIGINT) AS step,
           |  CAST(CASE WHEN MAX(ABS($err)) <= 1000000 // $sb THEN 1 ELSE 0 END
           |    AS BIGINT) AS step_bound_ok
           |FROM vals""".stripMargin
      }.mkString("\n        UNION ALL\n")
      s"""WITH vals AS (SELECT UNNEST(list_transform(embedding,
        |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS x6
        |  FROM embeddings),
        |base AS (
        |$arms)
        |SELECT b.bits, b.levels, b.n_vals, b.mse, b.max_abs_err, b.step,
        |  b.step_bound_ok,
        |  CAST(CASE WHEN n.mse > 0 THEN b.mse * 100 // n.mse ELSE 0 END
        |    AS BIGINT) AS ratio_e2
        |FROM base b LEFT JOIN base n ON n.bits = b.bits + 2
        |ORDER BY b.bits""".stripMargin
    },

    "q461_simpsons_paradox" ->
      """WITH cell AS (SELECT c.c_nationkey AS g, o.o_orderpriority AS pri,
        |    COUNT(*) AS n, SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
        |      AS sx
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT g, SUM(n) AS n, SUM(sx) AS sx FROM cell GROUP BY g),
        |pt AS (SELECT a.g AS ga, b.g AS gb,
        |    CASE WHEN a.sx * b.n > b.sx * a.n THEN 1
        |         WHEN a.sx * b.n < b.sx * a.n THEN -1 ELSE 0 END AS s_all,
        |    ABS(a.sx * b.n - b.sx * a.n) // (a.n * b.n) AS gap_cents
        |  FROM tot a JOIN tot b ON a.g < b.g),
        |ps AS (SELECT a.g AS ga, b.g AS gb, COUNT(*) AS n_strata,
        |    SUM(CASE WHEN a.sx * b.n > b.sx * a.n THEN 1 ELSE 0 END) AS n_up,
        |    SUM(CASE WHEN a.sx * b.n < b.sx * a.n THEN 1 ELSE 0 END)
        |      AS n_down
        |  FROM cell a JOIN cell b ON a.g < b.g AND a.pri = b.pri
        |  GROUP BY 1, 2),
        |cen AS (SELECT pt.*, ps.n_strata, ps.n_up, ps.n_down,
        |    CASE WHEN (pt.s_all = 1 AND ps.n_down = ps.n_strata)
        |      OR (pt.s_all = -1 AND ps.n_up = ps.n_strata) THEN 1 ELSE 0 END
        |      AS full_paradox,
        |    CASE WHEN (pt.s_all = 1 AND ps.n_down * 2 > ps.n_strata)
        |      OR (pt.s_all = -1 AND ps.n_up * 2 > ps.n_strata) THEN 1
        |      ELSE 0 END AS majority_flip
        |  FROM pt JOIN ps ON pt.ga = ps.ga AND pt.gb = ps.gb),
        |str AS (SELECT COALESCE(
        |    (SELECT ga * 100 + gb FROM cen WHERE full_paradox = 1
        |     ORDER BY gap_cents DESC, ga * 100 + gb ASC LIMIT 1), -1)
        |  AS strongest_pair)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MAX(n_strata) AS BIGINT) AS n_strata,
        |  CAST(SUM(full_paradox) AS BIGINT) AS n_full_paradox,
        |  CAST(SUM(majority_flip) AS BIGINT) AS n_majority_flip,
        |  CAST(SUM(CASE WHEN s_all = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact_ties,
        |  CAST(str.strongest_pair AS BIGINT) AS strongest_pair
        |FROM cen, str GROUP BY str.strongest_pair""".stripMargin
  )
}
