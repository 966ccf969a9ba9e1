package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorting-network wave (round 10, ninety-sixth wave): Batcher's
  * network certified by the 0–1 principle.
  *
  * q507 runs Batcher's odd-even mergesort network for n = 8 (19
  * compare-exchange gates, a fixed data-oblivious plan — the shape
  * hardware sorters and SIMD sorts use) and certifies it the way
  * Knuth says to: by the 0–1 PRINCIPLE. A comparator network sorts
  * every input iff it sorts every 0-1 input, and for n = 8 that is
  * 256 cases — so the certificate is EXHAUSTIVE, not sampled: all
  * 256 binary vectors pass through the 19 gates and come out
  * monotone, which proves the network correct for all 8-tuples of
  * anything. The proven network is then run over real 8-tuples of
  * order values (q504's hash groups), certifying per tuple that the
  * output is sorted AND a permutation of the input (multiset
  * preserved — array_sort equality). One fold per tuple, 19 steps,
  * data-independent: the gate list is the same for every row, which
  * is exactly why these networks vectorize.
  */
object SortNetQueries {

  // Batcher odd-even mergesort, n = 8: 19 compare-exchange gates
  private val Gates: Seq[(Int, Int)] = Seq(
    (1, 2), (3, 4), (5, 6), (7, 8),
    (1, 3), (2, 4), (5, 7), (6, 8),
    (2, 3), (6, 7),
    (1, 5), (2, 6), (3, 7), (4, 8),
    (3, 5), (4, 6),
    (2, 3), (4, 5), (6, 7))

  private def gatesArr(quote: Boolean): String =
    Gates.map { case (l, h) =>
      if (quote) s"{'lo': $l, 'hi': $h}"
      else s"named_struct('lo', $l, 'hi', $h)"
    }.mkString(", ")

  /** Apply the network to an 8-array column (Spark dialect). */
  private def applyNet(arr: String): String =
    s"""aggregate(array(${gatesArr(quote = false)}),
       |  $arr,
       |  (a, g) -> transform(sequence(1, 8), p ->
       |    case when p = g.lo then least(element_at(a, g.lo),
       |                                  element_at(a, g.hi))
       |         when p = g.hi then greatest(element_at(a, g.lo),
       |                                     element_at(a, g.hi))
       |         else element_at(a, p) end))""".stripMargin

  private val sortedChk =
    "size(filter(sequence(1, 7), i -> element_at(out, i) > " +
      "element_at(out, i + 1))) = 0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G452: Batcher network + the 0–1 principle, exhaustively ────────
    "q507_sorting_network" -> ((s, dir) => {
      // exhaustive half: all 256 binary vectors
      val bin = Tables.orders(s, dir).sparkSession.range(0, 256)
        .select(col("id").as("v"))
        .withColumn("inp", expr(
          "transform(sequence(0, 7), j -> (v div (case j when 0 then 1L " +
            "when 1 then 2L when 2 then 4L when 3 then 8L when 4 then 16L " +
            "when 5 then 32L when 6 then 64L else 128L end)) % 2)"))
        .withColumn("out", expr(applyNet("inp")))
        .withColumn("ok", expr(s"case when $sortedChk then 1L else 0L end"))
      val zeroOne = bin.agg(count(lit(1)).as("n_binary"),
        sum("ok").as("n_binary_sorted"))
      // applied half: real 8-tuples of order values
      val tot = Tables.orders(s, dir).agg(
        expr("greatest(count(1) div 8, 1L)").as("g_mod"))
      val real = Tables.orders(s, dir).crossJoin(broadcast(tot))
        .select(col("o_orderkey").as("k"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
          expr("pmod(md5_60(concat('sn:', cast(o_orderkey as string))), g_mod)")
            .as("grp"))
        .groupBy("grp")
        .agg(expr("transform(array_sort(collect_list(struct(k, v))), " +
          "x -> x.v)").as("inp"), count(lit(1)).as("n_st"))
        .filter(col("n_st") === 8)
        .withColumn("out", expr(applyNet("inp")))
        .withColumn("ok", expr(s"case when $sortedChk then 1L else 0L end"))
        .withColumn("perm_ok", expr(
          "case when out = array_sort(inp) then 1L else 0L end"))
      val realAgg = real.agg(count(lit(1)).as("n_real_groups"),
        sum("ok").as("n_real_sorted"), sum("perm_ok").as("n_permutation_ok"))
      zeroOne.crossJoin(realAgg)
        .select(lit(Gates.length.toLong).as("n_gates"),
          col("n_binary"), col("n_binary_sorted"),
          expr("case when n_binary_sorted = 256L then 1L else 0L end")
            .as("zero_one_certificate"),
          col("n_real_groups"), col("n_real_sorted"),
          col("n_permutation_ok"),
          expr("case when n_real_sorted = n_real_groups and " +
            "n_permutation_ok = n_real_groups then 1L else 0L end")
            .as("real_data_ok"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q507_sorting_network" -> {
      val gatesTable = Gates.zipWithIndex.map { case ((l, h), i) =>
        s"(${i + 1}, $l, $h)" }.mkString(", ")
      val sortedChkD = "len(list_filter(range(1, 8), i -> " +
        "out[CAST(i AS INT)] > out[CAST(i AS INT) + 1])) = 0"
      s"""WITH RECURSIVE gates(step, lo, hi) AS (VALUES $gatesTable),
        |binin AS (SELECT v,
        |    list_transform(range(0, 8), j -> (v // (CASE j
        |      WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8
        |      WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 ELSE 128 END))
        |      % 2)::BIGINT[] AS inp
        |  FROM (SELECT UNNEST(range(0, 256)) AS v)),
        |tot AS (SELECT GREATEST(COUNT(*) // 8, 1) AS g_mod FROM orders),
        |keyed AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST('0x' || substr(md5('sn:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) % (SELECT g_mod FROM tot) AS grp
        |  FROM orders),
        |realin AS (SELECT grp,
        |    list_transform(list_sort(list({'k': k, 'v': v})), x -> x.v)
        |      AS inp
        |  FROM keyed GROUP BY grp HAVING COUNT(*) = 8),
        |allin AS (SELECT 'b' AS src, v AS ident, inp FROM binin
        |  UNION ALL SELECT 'r', grp, inp FROM realin),
        |rec AS (
        |  SELECT src, ident, 0::BIGINT AS i, inp AS arr FROM allin
        |  UNION ALL
        |  SELECT z.src, z.ident, z.i,
        |    list_transform(range(1, 9), p ->
        |      CASE WHEN p = z.lo THEN LEAST(z.arr[z.lo], z.arr[z.hi])
        |           WHEN p = z.hi THEN GREATEST(z.arr[z.lo], z.arr[z.hi])
        |           ELSE z.arr[CAST(p AS INT)] END)::BIGINT[]
        |  FROM (SELECT r.src, r.ident, r.i + 1 AS i, r.arr, g.lo, g.hi
        |        FROM rec r JOIN gates g ON g.step = r.i + 1
        |        WHERE r.i < ${Gates.length}) z),
        |fin AS (SELECT r.src, r.ident, r.arr AS out, a.inp
        |  FROM rec r JOIN allin a ON r.src = a.src AND r.ident = a.ident
        |  WHERE r.i = ${Gates.length}),
        |chk AS (SELECT src,
        |    CASE WHEN $sortedChkD THEN 1 ELSE 0 END AS ok,
        |    CASE WHEN out = list_sort(inp) THEN 1 ELSE 0 END AS perm_ok
        |  FROM fin)
        |SELECT CAST(${Gates.length} AS BIGINT) AS n_gates,
        |  CAST((SELECT COUNT(*) FROM chk WHERE src = 'b') AS BIGINT)
        |    AS n_binary,
        |  CAST((SELECT SUM(ok) FROM chk WHERE src = 'b') AS BIGINT)
        |    AS n_binary_sorted,
        |  CAST(CASE WHEN (SELECT SUM(ok) FROM chk WHERE src = 'b') = 256
        |    THEN 1 ELSE 0 END AS BIGINT) AS zero_one_certificate,
        |  CAST((SELECT COUNT(*) FROM chk WHERE src = 'r') AS BIGINT)
        |    AS n_real_groups,
        |  CAST((SELECT SUM(ok) FROM chk WHERE src = 'r') AS BIGINT)
        |    AS n_real_sorted,
        |  CAST((SELECT SUM(perm_ok) FROM chk WHERE src = 'r') AS BIGINT)
        |    AS n_permutation_ok,
        |  CAST(CASE WHEN (SELECT SUM(ok) FROM chk WHERE src = 'r')
        |      = (SELECT COUNT(*) FROM chk WHERE src = 'r')
        |    AND (SELECT SUM(perm_ok) FROM chk WHERE src = 'r')
        |      = (SELECT COUNT(*) FROM chk WHERE src = 'r')
        |    THEN 1 ELSE 0 END AS BIGINT) AS real_data_ok""".stripMargin
    }
  )
}
