package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Availability wave (round 10, ninety-second wave): commit-protocol
  * availability under failures, measured vs the exact binomial.
  *
  * q501 closes the replication arc (quorum intersection q483, CRDT
  * convergence q484, Shamir q485): per key, each of 5 replicas is up
  * or down by an independent hash draw at p(down) = 1/8, and three
  * commit disciplines are scored — 2PC (all 5 up), majority quorum
  * (≥ 3 up), and any-replica reads (≥ 1 up). Beside each measured
  * availability sits the EXACT binomial Σ C(5,i)·7^i / 8^5 at e4
  * (denominator 32768 — pure integer arithmetic, no floats), and the
  * dominance chain avail(2PC) ≤ avail(majority) ≤ avail(any) is
  * counted per key, not inferred. The table is the canonical
  * consistency-vs-availability price list: on these draws 2PC loses
  * ~49% of keys, majority loses ~1%, at identical replica hardware.
  */
object AvailabilityQueries {

  private def binomUpE4(minUp: Int): Long = {
    def c(n: Int, k: Int): Long =
      if (k < 0 || k > n) 0L
      else (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    // P(up >= minUp) with p(up) = 7/8: Σ C(5,i)·7^i·1^(5−i) / 8^5
    val num = (minUp to 5).map(i => c(5, i) * math.pow(7, i).toLong).sum
    num * 10000L / 32768L
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G446: 2PC vs quorum availability, measured vs binomial ─────────
    "q501_commit_availability" -> ((s, dir) => {
      val ups = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          explode(expr("sequence(1, 5)")).as("r"))
        .withColumn("up", expr(
          "case when pmod(md5_60(concat('up:', cast(k as string), ':', " +
            "cast(r as string))), 8) != 0 then 1L else 0L end"))
        .groupBy("k").agg(sum("up").as("n_up"))
      val perKey = ups.select(col("k"), col("n_up"),
        expr("case when n_up = 5 then 1L else 0L end").as("a_2pc"),
        expr("case when n_up >= 3 then 1L else 0L end").as("a_maj"),
        expr("case when n_up >= 1 then 1L else 0L end").as("a_any"))
      val agg = perKey.agg(count(lit(1)).as("n_keys"),
        sum("a_2pc").as("up_2pc"), sum("a_maj").as("up_maj"),
        sum("a_any").as("up_any"),
        sum(expr("case when a_2pc <= a_maj and a_maj <= a_any then 1L " +
          "else 0L end")).as("n_dominance_ok"),
        expr("bit_xor(md5_60(concat(cast(k as string), ':', " +
          "cast(n_up as string))))").as("xor60_draws"))
      val schemes = Seq(("1_2pc_all5", "up_2pc", binomUpE4(5)),
        ("2_majority", "up_maj", binomUpE4(3)),
        ("3_any_replica", "up_any", binomUpE4(1)))
      schemes.map { case (name, colName, theory) =>
        agg.select(lit(name).as("scheme"), col("n_keys"),
          col(colName).as("n_available"),
          expr(s"$colName * 10000 div n_keys").as("measured_e4"),
          lit(theory).as("theory_e4"),
          expr(s"$colName * 10000 div n_keys - ${theory}L").as("gap_e4"),
          expr("case when n_dominance_ok = n_keys then 1L else 0L end")
            .as("dominance_ok"),
          col("xor60_draws"))
      }.reduce(_.unionByName(_)).orderBy("scheme")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q501_commit_availability" -> {
      val schemes = Seq(("1_2pc_all5", "n_up = 5", "up5", binomUpE4(5)),
        ("2_majority", "n_up >= 3", "up3", binomUpE4(3)),
        ("3_any_replica", "n_up >= 1", "up1", binomUpE4(1)))
      s"""WITH ups AS (SELECT o_orderkey AS k, SUM(
        |    CASE WHEN CAST('0x' || substr(md5('up:' ||
        |        CAST(o_orderkey AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)),
        |      1, 15) AS BIGINT) % 8 != 0 THEN 1 ELSE 0 END) AS n_up
        |  FROM orders, (SELECT UNNEST(range(1, 6)) AS r) r
        |  GROUP BY 1),
        |agg AS (SELECT COUNT(*) AS n_keys,
        |    ${schemes.map { case (_, cond, c, _) =>
             s"SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS $c"
           }.mkString(",\n|    ")},
        |    SUM(CASE WHEN (CASE WHEN n_up = 5 THEN 1 ELSE 0 END) <=
        |        (CASE WHEN n_up >= 3 THEN 1 ELSE 0 END)
        |      AND (CASE WHEN n_up >= 3 THEN 1 ELSE 0 END) <=
        |        (CASE WHEN n_up >= 1 THEN 1 ELSE 0 END)
        |      THEN 1 ELSE 0 END) AS n_dom,
        |    bit_xor(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
        |      CAST(n_up AS VARCHAR)), 1, 15) AS BIGINT)) AS xor60_draws
        |  FROM ups)
        |${schemes.map { case (name, _, c, theory) =>
             s"""SELECT '$name' AS scheme, CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST($c AS BIGINT) AS n_available,
             |  CAST($c * 10000 // n_keys AS BIGINT) AS measured_e4,
             |  CAST($theory AS BIGINT) AS theory_e4,
             |  CAST($c * 10000 // n_keys - $theory AS BIGINT) AS gap_e4,
             |  CAST(CASE WHEN n_dom = n_keys THEN 1 ELSE 0 END AS BIGINT)
             |    AS dominance_ok,
             |  xor60_draws
             |FROM agg"""
           }.mkString("\n|UNION ALL\n|")}
        |ORDER BY scheme""".stripMargin
    }
  )
}
