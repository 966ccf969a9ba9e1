package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ramsey wave (round 10, ninety-ninth wave): R(3,3) = 6, proven by
  * enumeration and observed on data.
  *
  * q511 carries a complete proof of both halves of R(3,3) = 6:
  * (upper) ALL 2¹⁵ = 32768 two-colorings of K₆'s edges contain a
  * monochromatic triangle — zero escapees, exhaustively enumerated,
  * so the query PROVES any party of six has three mutual friends or
  * three mutual strangers; (lower) K₅ escapes — exactly 12 of the
  * 2¹⁰ colorings of K₅ are triangle-free (the two pentagon/pentagram
  * orientations under rotation-reflection, a known constant
  * reproduced to the digit). The theorem is then OBSERVED on real
  * data: customers hash into parties of six, each pair's edge color
  * is a hash parity, and every single party exhibits a mono triangle
  * — as the proof says it must. Edge indexes and triangle triples
  * are generated literals, so each bit test is a plain
  * (v div 2ᵉ) % 2 with a literal power — no runtime index math.
  */
object RamseyQueries {

  private def pairs(n: Int): Seq[(Int, Int)] =
    for { i <- 1 to n; j <- i + 1 to n } yield (i, j)

  private def triangles(n: Int): Seq[(Int, Int, Int)] = {
    val idx = pairs(n).zipWithIndex.toMap
    for { a <- 1 to n; b <- a + 1 to n; c <- b + 1 to n }
      yield (idx((a, b)), idx((a, c)), idx((b, c)))
  }

  /** zero-mono-coloring count for K_n via exhaustive enumeration. */
  private def escapeCount(n: Int, dialect: String): String = {
    val m = pairs(n).size
    val bit = (e: Int) => s"(v div ${1L << e}) % 2"
    val bitD = (e: Int) => s"(v // ${1L << e}) % 2"
    val mono = triangles(n).map { case (e1, e2, e3) =>
      val (b1, b2, b3) =
        if (dialect == "spark") (bit(e1), bit(e2), bit(e3))
        else (bitD(e1), bitD(e2), bitD(e3))
      s"(case when $b1 = $b2 and $b2 = $b3 then 1 else 0 end)"
    }.mkString(" + ")
    if (dialect == "spark")
      s"""size(filter(sequence(0, ${(1 << m) - 1}),
         |  v -> ($mono) = 0))""".stripMargin
    else
      s"""(SELECT COUNT(*) FROM (SELECT UNNEST(range(0, ${1 << m})) AS v)
         |  WHERE (${mono.replace("case when", "CASE WHEN")
             .replace("then 1 else 0 end", "THEN 1 ELSE 0 END")}) = 0)"""
        .stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G456: R(3,3) = 6 — exhaustive proof + data observation ─────────
    "q511_ramsey_33" -> ((s, dir) => {
      // data half: parties of six customers, hash edge colors
      val tot = Tables.customer(s, dir).agg(
        expr("greatest(count(1) div 6, 1L)").as("g_mod"))
      val parties = Tables.customer(s, dir).crossJoin(broadcast(tot))
        .select(col("c_custkey").as("c"),
          expr("pmod(md5_60(concat('pt:', cast(c_custkey as string))), g_mod)")
            .as("grp"))
        .groupBy("grp")
        .agg(expr("array_sort(collect_list(c))").as("cs"),
          count(lit(1)).as("n_c"))
        .filter(col("n_c") === 6)
      def edge(i: Int, j: Int): String =
        s"pmod(md5_60(concat('rc:', cast(element_at(cs, $i) as string), " +
          s"':', cast(element_at(cs, $j) as string))), 2)"
      val monoData = (for { a <- 1 to 6; b <- a + 1 to 6; c <- b + 1 to 6 }
        yield s"(case when ${edge(a, b)} = ${edge(a, c)} and " +
          s"${edge(a, c)} = ${edge(b, c)} then 1 else 0 end)").mkString(" + ")
      val dataAgg = parties
        .withColumn("n_mono", expr(s"cast(($monoData) as bigint)"))
        .agg(count(lit(1)).as("n_parties"),
          sum(expr("case when n_mono >= 1L then 1L else 0L end"))
            .as("n_parties_with_mono"),
          min("n_mono").as("mono_min"), max("n_mono").as("mono_max"))
      val enum6 = Tables.customer(s, dir).sparkSession.range(0, 1)
        .select(
          expr(s"cast(${escapeCount(6, "spark")} as bigint)").as("k6_escapees"),
          expr(s"cast(${escapeCount(5, "spark")} as bigint)").as("k5_escapees"))
      enum6.crossJoin(dataAgg)
        .select(lit(32768L).as("k6_colorings"), col("k6_escapees"),
          expr("case when k6_escapees = 0L then 1L else 0L end")
            .as("ramsey_upper_proved"),
          lit(1024L).as("k5_colorings"), col("k5_escapees"),
          expr("case when k5_escapees = 12L then 1L else 0L end")
            .as("ramsey_lower_exact"),
          col("n_parties"), col("n_parties_with_mono"),
          expr("case when n_parties_with_mono = n_parties then 1L else 0L end")
            .as("observed_on_data"),
          col("mono_min"), col("mono_max"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q511_ramsey_33" -> {
      def edge(i: Int, j: Int): String =
        s"CAST('0x' || substr(md5('rc:' || CAST(cs[$i] AS VARCHAR) || ':' || " +
          s"CAST(cs[$j] AS VARCHAR)), 1, 15) AS BIGINT) % 2"
      val monoData = (for { a <- 1 to 6; b <- a + 1 to 6; c <- b + 1 to 6 }
        yield s"(CASE WHEN ${edge(a, b)} = ${edge(a, c)} AND " +
          s"${edge(a, c)} = ${edge(b, c)} THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH tot AS (SELECT GREATEST(COUNT(*) // 6, 1) AS g_mod
        |  FROM customer),
        |parties AS (SELECT grp, list_sort(list(c)) AS cs, COUNT(*) AS n_c
        |  FROM (SELECT c_custkey AS c,
        |      CAST('0x' || substr(md5('pt:' || CAST(c_custkey AS VARCHAR)),
        |        1, 15) AS BIGINT) % (SELECT g_mod FROM tot) AS grp
        |    FROM customer)
        |  GROUP BY grp HAVING COUNT(*) = 6),
        |pm AS (SELECT grp, ($monoData) AS n_mono FROM parties),
        |da AS (SELECT COUNT(*) AS n_parties,
        |    SUM(CASE WHEN n_mono >= 1 THEN 1 ELSE 0 END)
        |      AS n_parties_with_mono,
        |    MIN(n_mono) AS mono_min, MAX(n_mono) AS mono_max
        |  FROM pm)
        |SELECT CAST(32768 AS BIGINT) AS k6_colorings,
        |  CAST(${escapeCount(6, "duck")} AS BIGINT) AS k6_escapees,
        |  CAST(CASE WHEN ${escapeCount(6, "duck")} = 0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS ramsey_upper_proved,
        |  CAST(1024 AS BIGINT) AS k5_colorings,
        |  CAST(${escapeCount(5, "duck")} AS BIGINT) AS k5_escapees,
        |  CAST(CASE WHEN ${escapeCount(5, "duck")} = 12 THEN 1 ELSE 0 END
        |    AS BIGINT) AS ramsey_lower_exact,
        |  CAST(n_parties AS BIGINT) AS n_parties,
        |  CAST(n_parties_with_mono AS BIGINT) AS n_parties_with_mono,
        |  CAST(CASE WHEN n_parties_with_mono = n_parties THEN 1 ELSE 0 END
        |    AS BIGINT) AS observed_on_data,
        |  CAST(mono_min AS BIGINT) AS mono_min,
        |  CAST(mono_max AS BIGINT) AS mono_max
        |FROM da""".stripMargin
    }
  )
}
