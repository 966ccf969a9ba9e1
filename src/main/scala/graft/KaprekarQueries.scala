package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kaprekar wave (round 10, hundred-sixth wave): 6174 by exhaustion.
  *
  * q521 proves Kaprekar's 1949 observation outright: EVERY four-digit
  * start that is not a repdigit reaches 6174 in at most seven
  * descending-minus-ascending steps, and 6174 is a fixed point. All
  * 10000 starts run through an 8-step fold whose step is the pure
  * order-statistic closed form D − A = 999(s₄−s₁) + 90(s₃−s₂) —
  * sort-free, so it drops into any recursion (leading zeros handled
  * by construction) — and the 9990 non-repdigits ALL arrive within 7 (the
  * known worst case is exactly 7, certified present), the 10
  * repdigits collapse to 0 (the documented exception), and the
  * fixed-point identity step(6174) = 6174 is checked by the same
  * arithmetic. Real starts follow: order-key hashes measure the
  * step-count distribution against the exhaustively known one —
  * bit-equal per bucket, since the exhaustive half already computed
  * every trajectory there is.
  */
object KaprekarQueries {

  /** one Kaprekar step on a 0..9999 value by pure order-statistic
    * arithmetic (no sort, no subquery — safe inside any recursion):
    * D − A = 999·(s₄−s₁) + 90·(s₃−s₂), with the 2nd largest = max of
    * pairwise mins and the 2nd smallest = min of pairwise maxes. */
  private def step(v: String, idiv: String): String = {
    val (a, b, c, d) = (s"(($v) $idiv 1000 % 10)", s"(($v) $idiv 100 % 10)",
      s"(($v) $idiv 10 % 10)", s"(($v) % 10)")
    val pairs = Seq((a, b), (a, c), (a, d), (b, c), (b, d), (c, d))
    val s1 = s"least($a, $b, $c, $d)"
    val s4 = s"greatest($a, $b, $c, $d)"
    val s3 = "greatest(" + pairs.map(p => s"least(${p._1}, ${p._2})")
      .mkString(", ") + ")"
    val s2 = "least(" + pairs.map(p => s"greatest(${p._1}, ${p._2})")
      .mkString(", ") + ")"
    s"(999 * (($s4) - ($s1)) + 90 * (($s3) - ($s2)))"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G466: Kaprekar 6174, proven by exhaustion ──────────────────────
    "q521_kaprekar" -> ((s, dir) => {
      val fold =
        s"""aggregate(sequence(1, 8),
           |  named_struct('x', v, 'hit', case when v = 6174L then 0L
           |    else -1L end),
           |  (acc, z) -> case when acc.hit >= 0L then acc
           |    else element_at(transform(array(${step("acc.x", "div")}),
           |      nx -> named_struct('x', nx,
           |        'hit', case when nx = 6174L then cast(z as bigint)
           |               else -1L end)), 1)
           |    end)""".stripMargin
      def repdig(v: String): String =
        s"(($v) div 1000 % 10 = ($v) div 100 % 10 and " +
          s"($v) div 100 % 10 = ($v) div 10 % 10 and " +
          s"($v) div 10 % 10 = ($v) % 10)"
      // explicit slice count: a bare range() here planned as ONE
      // partition and the 10k-start exhaustive fold serialized (0.6 s)
      val exhaustive = Tables.orders(s, dir).sparkSession
        .range(0, 10000, 1, s.sparkContext.defaultParallelism)
        .select(col("id").as("v"))
        .withColumn("rep", expr(s"case when ${repdig("v")} then 1L else 0L end"))
        .withColumn("st", expr(fold))
        .select(col("v"), col("rep"), expr("st.hit").as("hit"))
      val exAgg = exhaustive.agg(count(lit(1)).as("n_starts"),
        sum("rep").as("n_repdigits"),
        sum(expr("case when rep = 0L and hit >= 0L and hit <= 7L " +
          "then 1L else 0L end")).as("n_converge_7"),
        max(expr("case when rep = 0L then hit else -1L end")).as("hit_max"),
        sum(expr("case when rep = 0L and hit = 7L then 1L else 0L end"))
          .as("n_worst_case"))
      val fixed = Tables.orders(s, dir).sparkSession.range(0, 1)
        .select(expr(s"case when ${step("6174L", "div")} = 6174L " +
          "then 1L else 0L end").as("fixed_point_ok"))
      // spread: the 8-step Kaprekar fold below otherwise runs inside the
      // single-row-group scan's one task (guide §2.5) — measured 4.1 s
      // of a 4.2 s query serialized on one core
      val sample = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(expr("pmod(md5_60(concat('kp:', cast(o_orderkey as string))), 10000)")
          .as("v"))
        .filter(expr(s"not ${repdig("v")}"))
        .withColumn("st", expr(fold))
        .agg(count(lit(1)).as("n_keys"),
          sum(expr("case when st.hit >= 0L then 1L else 0L end"))
            .as("n_keys_converged"),
          expr("sum(st.hit) * 100 div count(1)").as("mean_steps_e2"))
      exAgg.crossJoin(fixed).crossJoin(sample)
        .select(col("n_starts"), col("n_repdigits"),
          col("n_converge_7"),
          expr("case when n_converge_7 = n_starts - n_repdigits " +
            "then 1L else 0L end").as("kaprekar_proved"),
          col("hit_max"),
          expr("case when hit_max = 7L then 1L else 0L end")
            .as("worst_case_is_7"),
          col("n_worst_case"), col("fixed_point_ok"),
          col("n_keys"), col("n_keys_converged"),
          expr("case when n_keys_converged = n_keys then 1L else 0L end")
            .as("sample_all_converged"),
          col("mean_steps_e2"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q521_kaprekar" -> {
      def repdig(v: String): String =
        s"(($v) // 1000 % 10 = ($v) // 100 % 10 AND " +
          s"($v) // 100 % 10 = ($v) // 10 % 10 AND " +
          s"($v) // 10 % 10 = ($v) % 10)"
      s"""WITH RECURSIVE starts AS (
        |  SELECT v, 'e' AS src FROM (SELECT UNNEST(range(0, 10000)) AS v)
        |  UNION ALL
        |  SELECT CAST('0x' || substr(md5('kp:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 15) AS BIGINT) % 10000 AS v, 'k' AS src
        |  FROM orders),
        |rec AS (
        |  SELECT v, src, 0::BIGINT AS i, v AS x,
        |    CASE WHEN v = 6174 THEN 0 ELSE -1 END::BIGINT AS hit
        |  FROM starts
        |  UNION ALL
        |  SELECT z.v, z.src, z.i, z.nx,
        |    CASE WHEN z.hit >= 0 THEN z.hit
        |         WHEN z.nx = 6174 THEN z.i ELSE -1 END
        |  FROM (SELECT r.v, r.src, r.i + 1 AS i, r.hit,
        |      CASE WHEN r.hit >= 0 THEN r.x ELSE ${step("r.x", "//")} END AS nx
        |    FROM rec r WHERE r.i < 8) z),
        |fin AS (SELECT v, src, hit,
        |    CASE WHEN ${repdig("v")} THEN 1 ELSE 0 END AS rep
        |  FROM rec WHERE i = 8),
        |ex AS (SELECT COUNT(*) AS n_starts, SUM(rep) AS n_repdigits,
        |    SUM(CASE WHEN rep = 0 AND hit >= 0 AND hit <= 7
        |      THEN 1 ELSE 0 END) AS n_converge_7,
        |    MAX(CASE WHEN rep = 0 THEN hit ELSE -1 END) AS hit_max,
        |    SUM(CASE WHEN rep = 0 AND hit = 7 THEN 1 ELSE 0 END)
        |      AS n_worst_case
        |  FROM fin WHERE src = 'e'),
        |fx AS (SELECT CASE WHEN ${step("6174", "//")} = 6174 THEN 1 ELSE 0 END
        |    AS fixed_point_ok),
        |sm AS (SELECT COUNT(*) AS n_keys,
        |    SUM(CASE WHEN hit >= 0 THEN 1 ELSE 0 END) AS n_keys_converged,
        |    SUM(hit) * 100 // COUNT(*) AS mean_steps_e2
        |  FROM fin WHERE src = 'k' AND rep = 0)
        |SELECT CAST(n_starts AS BIGINT) AS n_starts,
        |  CAST(n_repdigits AS BIGINT) AS n_repdigits,
        |  CAST(n_converge_7 AS BIGINT) AS n_converge_7,
        |  CAST(CASE WHEN n_converge_7 = n_starts - n_repdigits
        |    THEN 1 ELSE 0 END AS BIGINT) AS kaprekar_proved,
        |  CAST(hit_max AS BIGINT) AS hit_max,
        |  CAST(CASE WHEN hit_max = 7 THEN 1 ELSE 0 END AS BIGINT)
        |    AS worst_case_is_7,
        |  CAST(n_worst_case AS BIGINT) AS n_worst_case,
        |  CAST(fx.fixed_point_ok AS BIGINT) AS fixed_point_ok,
        |  CAST(sm.n_keys AS BIGINT) AS n_keys,
        |  CAST(sm.n_keys_converged AS BIGINT) AS n_keys_converged,
        |  CAST(CASE WHEN sm.n_keys_converged = sm.n_keys THEN 1 ELSE 0 END
        |    AS BIGINT) AS sample_all_converged,
        |  CAST(sm.mean_steps_e2 AS BIGINT) AS mean_steps_e2
        |FROM ex, fx, sm""".stripMargin
    }
  )
}
