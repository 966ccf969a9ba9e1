package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checksum wave (round 10, ninety-fifth wave): ISO 7064 mod 97-10 —
  * the checksum that closes Luhn's blind spot.
  *
  * q506 re-runs q467's attack protocol — the same hash-chosen
  * single-digit bump and adjacent transposition against the same
  * 9-digit payloads — but protects them with ISO 7064 mod 97-10
  * (IBAN's scheme: two check digits, the full number ≡ 1 mod 97)
  * instead of Luhn. The theory says the upgrade is total: a bump
  * changes the value by δ·10ʲ with δ ∈ {1, −9}, a transposition by
  * 9Δ·10ʲ, and since 97 is prime and coprime to 10, 9, and every
  * |δ| ≤ 9, NO single substitution and NO adjacent transposition can
  * survive — including the 09/90 swaps that are invisible to Luhn
  * (q467 counted 241 of them slipping through at sf0.01). All three
  * guarantees are counted: every protected number validates, every
  * bump is caught, every non-no-op transposition is caught, and the
  * Luhn-blind 09/90 pairs are tallied separately — all caught, the
  * blind spot closed. An 11-digit number fits in a BIGINT, so the
  * residue is one cast and one %, no fold.
  */
object ChecksumQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G451: ISO 7064 mod 97-10 under q467's attack ───────────────────
    "q506_mod97_audit" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"))
        .withColumn("pay", expr("lpad(cast(k as string), 9, '0')"))
        // check digits: full number payload·100 + cc must be ≡ 1 mod 97
        .withColumn("cc", expr(
          "pmod(98L - pmod(cast(pay as bigint) * 100L, 97L), 97L)"))
        .withColumn("prot", expr("concat(pay, lpad(cast(cc as string), 2, '0'))"))
        .withColumn("h", expr("md5_60(cast(k as string))"))
        .withColumn("p1", expr("cast(pmod(h, 9) + 1 as int)"))
        .withColumn("att1", expr(
          """concat(substring(prot, 1, p1 - 1),
            |  cast(pmod(cast(substring(prot, p1, 1) as bigint) + 1, 10)
            |    as string),
            |  substring(prot, p1 + 1))""".stripMargin))
        .withColumn("p2", expr("cast(pmod(h div 16, 8) + 1 as int)"))
        .withColumn("att2", expr(
          """concat(substring(prot, 1, p2 - 1),
            |  substring(prot, p2 + 1, 1), substring(prot, p2, 1),
            |  substring(prot, p2 + 2))""".stripMargin))
        .withColumn("d1", expr(
          "case when pmod(cast(att1 as bigint), 97L) != 1L then 1L else 0L end"))
        .withColumn("d2", expr(
          "case when pmod(cast(att2 as bigint), 97L) != 1L then 1L else 0L end"))
        .withColumn("noop2", expr(
          "case when substring(prot, p2, 1) = substring(prot, p2 + 1, 1) " +
            "then 1L else 0L end"))
        .withColumn("blind2", expr(
          """case when (substring(prot, p2, 2) = '09'
            |        or substring(prot, p2, 2) = '90') then 1L else 0L end"""
            .stripMargin))
      o.agg(count(lit(1)).as("n"),
          sum(expr("case when pmod(cast(prot as bigint), 97L) = 1L " +
            "then 1L else 0L end")).as("n_valid"),
          sum("d1").as("n_caught_digit"),
          sum("d2").as("n_caught_transpose"),
          sum("noop2").as("n_noop_swaps"),
          sum("blind2").as("n_luhn_blind_0990"),
          sum(expr("case when blind2 = 1L and d2 = 1L then 1L else 0L end"))
            .as("n_blind_caught_here"))
        .select(col("n"), col("n_valid"),
          expr("case when n_valid = n then 1L else 0L end").as("all_valid"),
          col("n_caught_digit"),
          expr("case when n_caught_digit = n then 1L else 0L end")
            .as("digit_guarantee_ok"),
          col("n_caught_transpose"), col("n_noop_swaps"),
          expr("case when n_caught_transpose = n - n_noop_swaps " +
            "then 1L else 0L end").as("transpose_guarantee_ok"),
          col("n_luhn_blind_0990"), col("n_blind_caught_here"),
          expr("case when n_blind_caught_here = n_luhn_blind_0990 " +
            "then 1L else 0L end").as("blind_spot_closed"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q506_mod97_audit" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS pay,
        |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM orders),
        |pr AS (SELECT k, pay, h,
        |    pay || lpad(CAST(((98 - (CAST(pay AS BIGINT) * 100) % 97) % 97)
        |      AS VARCHAR), 2, '0') AS prot,
        |    CAST(h % 9 + 1 AS INT) AS p1,
        |    CAST((h // 16) % 8 + 1 AS INT) AS p2
        |  FROM o),
        |at AS (SELECT k, prot, p1, p2,
        |    substr(prot, 1, p1 - 1) ||
        |      CAST((CAST(substr(prot, p1, 1) AS BIGINT) + 1) % 10 AS VARCHAR)
        |      || substr(prot, p1 + 1) AS att1,
        |    substr(prot, 1, p2 - 1) || substr(prot, p2 + 1, 1)
        |      || substr(prot, p2, 1) || substr(prot, p2 + 2) AS att2
        |  FROM pr),
        |fl AS (SELECT k, prot, p2,
        |    CASE WHEN CAST(att1 AS BIGINT) % 97 != 1 THEN 1 ELSE 0 END AS d1,
        |    CASE WHEN CAST(att2 AS BIGINT) % 97 != 1 THEN 1 ELSE 0 END AS d2,
        |    CASE WHEN substr(prot, p2, 1) = substr(prot, p2 + 1, 1)
        |      THEN 1 ELSE 0 END AS noop2,
        |    CASE WHEN substr(prot, p2, 2) IN ('09', '90')
        |      THEN 1 ELSE 0 END AS blind2
        |  FROM at)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN CAST(prot AS BIGINT) % 97 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_valid,
        |  CAST(CASE WHEN SUM(CASE WHEN CAST(prot AS BIGINT) % 97 = 1
        |    THEN 1 ELSE 0 END) = COUNT(*) THEN 1 ELSE 0 END AS BIGINT)
        |    AS all_valid,
        |  CAST(SUM(d1) AS BIGINT) AS n_caught_digit,
        |  CAST(CASE WHEN SUM(d1) = COUNT(*) THEN 1 ELSE 0 END AS BIGINT)
        |    AS digit_guarantee_ok,
        |  CAST(SUM(d2) AS BIGINT) AS n_caught_transpose,
        |  CAST(SUM(noop2) AS BIGINT) AS n_noop_swaps,
        |  CAST(CASE WHEN SUM(d2) = COUNT(*) - SUM(noop2) THEN 1 ELSE 0 END
        |    AS BIGINT) AS transpose_guarantee_ok,
        |  CAST(SUM(blind2) AS BIGINT) AS n_luhn_blind_0990,
        |  CAST(SUM(CASE WHEN blind2 = 1 AND d2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_blind_caught_here,
        |  CAST(CASE WHEN SUM(CASE WHEN blind2 = 1 AND d2 = 1 THEN 1 ELSE 0 END)
        |    = SUM(blind2) THEN 1 ELSE 0 END AS BIGINT) AS blind_spot_closed
        |FROM fl""".stripMargin
  )
}
