package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Erasure-code wave (round 10, hundred-seventh wave): a (6,4) XOR
  * code's decodability census, with real recovery certified.
  *
  * q522 takes the (6,4) binary erasure code with generator masks
  * [1, 2, 4, 8, 15, 6] (four systematic blocks, a full-parity block,
  * and B2⊕B3) and classifies ALL 15 two-erasure patterns in-engine:
  * a pattern is decodable iff the four surviving masks span GF(2)⁴,
  * checked by enumerating the 16 subset-XORs and counting distinct
  * values — and the census corrects intuition: 11 of 15 decode, not
  * the 13 an armchair count suggests, because besides the obvious
  * orphanings ({C1,C5} kills bit 0, {C4,C5} orphans B4) two DEPENDENCY
  * failures hide in the masks ({C1,C4} leaves 6 = 2⊕4, {C2,C3} leaves
  * 6 = 15⊕1⊕8) — exactly the kind of fact one computes, not recalls. Real data then flows through the code: per order key,
  * four 16-bit blocks encode into six coded values, a hash picks the
  * erasure pair, and for every DECODABLE draw the engine actually
  * reconstructs block B1 — the minimal surviving subset whose masks
  * XOR to the unit vector, its coded values XOR'd back together —
  * and certifies recovered = original on every such key. Erasure
  * coding's entire contract (rank ⟺ recovery), enumerated and then
  * exercised.
  */
object ErasureQueries {

  private val Masks = Seq(1, 2, 4, 8, 15, 6)
  private val Pairs: Seq[(Int, (Int, Int))] =
    (for { i <- 1 to 6; j <- i + 1 to 6 } yield (i, j)).zipWithIndex
      .map { case (p, ix) => (ix + 1, p) }

  private def keptIdx(p: Int): Seq[Int] = {
    val (i, j) = Pairs.find(_._1 == p).get._2
    (1 to 6).filterNot(x => x == i || x == j)
  }

  /** CASE over pattern id → array of the 4 surviving mask literals. */
  private def keptMaskArr(pCol: String, dialect: String): String = {
    val body = Pairs.map { case (p, _) =>
      val ms = keptIdx(p).map(ix => Masks(ix - 1)).mkString(", ")
      if (dialect == "spark") s"when $p then array(${ms})"
      else s"WHEN $p THEN [$ms]"
    }.mkString(" ")
    if (dialect == "spark") s"(case $pCol $body end)"
    else s"(CASE $pCol $body END)"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G467: (6,4) XOR erasure decodability + real recovery ───────────
    "q522_erasure_code" -> ((s, dir) => {
      // subset-XOR of the kept masks, selected by subset bits
      def xorSubset(sVar: String, km: String): String =
        s"""aggregate(sequence(1, 4), 0L, (a, t) ->
           |  case when (($sVar) div (case t when 1 then 1 when 2 then 2
           |    when 3 then 4 else 8 end)) % 2 = 1
           |  then a ^ cast(element_at($km, t) as bigint) else a end)"""
          .stripMargin
      val exhaustive = Tables.orders(s, dir).sparkSession.range(1, 16)
        .select(col("id").cast("int").as("p"))
        .withColumn("km", expr(keptMaskArr("p", "spark")))
        .withColumn("span", expr(
          s"""cast(size(array_distinct(transform(sequence(0, 15),
             |  ss -> ${xorSubset("ss", "km")}))) as bigint)""".stripMargin))
        .withColumn("decodable", expr(
          "case when span = 16L then 1L else 0L end"))
      val exAgg = exhaustive.agg(count(lit(1)).as("n_patterns"),
        sum("decodable").as("n_decodable"),
        expr("bit_xor(case when decodable = 0L then cast(p as bigint) end)")
          .as("xor_undecodable_ids"))
      // data half: encode, erase by hash, recover B1 where decodable
      def block(i: Int): String =
        s"pmod(md5_60(concat('eb$i:', cast(k as string))), 65536)"
      def coded(i: Int): String = {
        val parts = (1 to 4).filter(t => (Masks(i - 1) & (1 << (t - 1))) != 0)
          .map(t => s"b$t")
        parts.reduce((a, b) => s"($a ^ $b)")
      }
      val keptValArr = "(case p " + Pairs.map { case (p, _) =>
        s"when $p then array(${keptIdx(p).map(ix => s"c$ix").mkString(", ")})"
      }.mkString(" ") + " end)"
      val recover =
        s"""element_at(transform(array(
           |  array_min(filter(sequence(0, 15),
           |    ss -> ${xorSubset("ss", "km")} = 1L))),
           |  sstar -> aggregate(sequence(1, 4), 0L, (a, t) ->
           |    case when (sstar div (case t when 1 then 1 when 2 then 2
           |      when 3 then 4 else 8 end)) % 2 = 1
           |    then a ^ element_at(kv, t) else a end)), 1)""".stripMargin
      // spread: the ~10 md5/XOR block builds + 16-subset recovery fold
      // per row otherwise run inside the single-row-group scan's one
      // task (guide §2.5)
      var keyed = graft.ops.Relational.spread(Tables.orders(s, dir))
        .select(col("o_orderkey").as("k"),
          expr("cast(1 + pmod(md5_60(concat('ep:', cast(o_orderkey as string))), 15) as int)")
            .as("p"))
      (1 to 4).foreach(i => keyed = keyed.withColumn(s"b$i", expr(block(i))))
      (1 to 6).foreach(i => keyed = keyed.withColumn(s"c$i", expr(coded(i))))
      val dataAgg = keyed
        .withColumn("km", expr(keptMaskArr("p", "spark")))
        .withColumn("kv", expr(keptValArr))
        .join(broadcast(exhaustive.select(col("p"), col("decodable"))), "p")
        .withColumn("rec1", expr(
          s"case when decodable = 1L then $recover else -1L end"))
        .agg(count(lit(1)).as("n_keys"),
          sum("decodable").as("n_decodable_draws"),
          sum(expr("case when decodable = 1L and rec1 = b1 then 1L " +
            "else 0L end")).as("n_recovered_ok"))
      exAgg.crossJoin(dataAgg)
        .select(col("n_patterns"), col("n_decodable"),
          coalesce(col("xor_undecodable_ids"), lit(0L))
            .as("xor_undecodable_ids"),
          col("n_keys"), col("n_decodable_draws"), col("n_recovered_ok"),
          expr("case when n_recovered_ok = n_decodable_draws then 1L " +
            "else 0L end").as("recovery_certificate"),
          expr("n_decodable_draws * 10000 div n_keys").as("decodable_e4"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q522_erasure_code" -> {
      def xorSubsetD(sVar: String, km: String): String =
        s"""list_aggregate(list_transform(range(1, 5), t ->
           |  CASE WHEN (($sVar) // (CASE t WHEN 1 THEN 1 WHEN 2 THEN 2
           |    WHEN 3 THEN 4 ELSE 8 END)) % 2 = 1
           |  THEN $km[CAST(t AS INT)] ELSE 0 END), 'bit_xor')""".stripMargin
      def codedD(i: Int): String = {
        val parts = (1 to 4).filter(t => (Masks(i - 1) & (1 << (t - 1))) != 0)
          .map(t => s"b$t")
        parts.reduce((a, b) => s"xor($a, $b)")
      }
      val keptValArrD = "(CASE p " + Pairs.map { case (p, _) =>
        s"WHEN $p THEN [${keptIdx(p).map(ix => s"c$ix").mkString(", ")}]"
      }.mkString(" ") + " END)"
      s"""WITH ex AS (SELECT p, ${keptMaskArr("p", "duck")} AS km
        |  FROM (SELECT UNNEST(range(1, 16)) AS p)),
        |exd AS (SELECT p, km,
        |    CASE WHEN len(list_distinct(list_transform(range(0, 16),
        |      ss -> ${xorSubsetD("ss", "km")}))) = 16 THEN 1 ELSE 0 END
        |      AS decodable
        |  FROM ex),
        |exagg AS (SELECT COUNT(*) AS n_patterns, SUM(decodable) AS n_decodable,
        |    COALESCE(bit_xor(CASE WHEN decodable = 0 THEN p END), 0)
        |      AS xor_undecodable_ids
        |  FROM exd),
        |keyed AS (SELECT o_orderkey AS k,
        |    CAST(1 + CAST('0x' || substr(md5('ep:' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 15 AS INT)
        |      AS p,
        |    ${(1 to 4).map(i =>
             s"CAST('0x' || substr(md5('eb$i:' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 65536 AS b$i")
             .mkString(",\n|    ")}
        |  FROM orders),
        |enc AS (SELECT *, ${(1 to 6).map(i => s"${codedD(i)} AS c$i")
             .mkString(", ")} FROM keyed),
        |wd AS (SELECT e.*, x.decodable, x.km, $keptValArrD AS kv
        |  FROM enc e JOIN exd x USING (p)),
        |rc0 AS (SELECT wd.*,
        |    CASE WHEN decodable = 1 THEN list_min(list_filter(range(0, 16),
        |      ss -> ${xorSubsetD("ss", "km")} = 1)) ELSE -1 END AS sstar
        |  FROM wd),
        |rc AS (SELECT rc0.*,
        |    CASE WHEN decodable = 1 THEN
        |      list_aggregate(list_transform(range(1, 5), t ->
        |        CASE WHEN ((sstar) // (CASE t WHEN 1 THEN 1 WHEN 2 THEN 2
        |          WHEN 3 THEN 4 ELSE 8 END)) % 2 = 1
        |        THEN kv[CAST(t AS INT)] ELSE 0 END), 'bit_xor')
        |    ELSE -1 END AS rec1
        |  FROM rc0)
        |SELECT CAST(exagg.n_patterns AS BIGINT) AS n_patterns,
        |  CAST(exagg.n_decodable AS BIGINT) AS n_decodable,
        |  CAST(exagg.xor_undecodable_ids AS BIGINT) AS xor_undecodable_ids,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(decodable) AS BIGINT) AS n_decodable_draws,
        |  CAST(SUM(CASE WHEN decodable = 1 AND rec1 = b1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_recovered_ok,
        |  CAST(CASE WHEN SUM(CASE WHEN decodable = 1 AND rec1 = b1
        |      THEN 1 ELSE 0 END) = SUM(decodable) THEN 1 ELSE 0 END
        |    AS BIGINT) AS recovery_certificate,
        |  CAST(SUM(decodable) * 10000 // COUNT(*) AS BIGINT) AS decodable_e4
        |FROM rc, exagg
        |GROUP BY exagg.n_patterns, exagg.n_decodable,
        |  exagg.xor_undecodable_ids""".stripMargin
    }
  )
}
