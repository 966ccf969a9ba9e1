package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Number-theoretic wave (round 10, eighty-eighth wave): the birthday
  * bound, measured.
  *
  * q496 measures hash-collision mass against the exact birthday
  * expectation at four prefix widths. Every order key's md5_60 top-b
  * bits (b = 16/20/24/28) bucket the keys; colliding pairs are
  * Σ C(cnt, 2) over buckets (exact, from one groupBy per width —
  * all four widths in ONE pass via explode), and the expectation
  * under uniform hashing is C(n, 2)/2ᵇ, carried at e4 in exact
  * integers. The table shows the crossover the birthday bound
  * predicts: thousands of collisions at b = 16 (n ≫ 2^(b/2)), a
  * handful at the √-threshold, none far above it. Mass conservation
  * (Σ cnt = n per width) is certified; the measured/expected ratio
  * is reported, not asserted — collision counts are the one place
  * the engine must not pretend determinism of the sample equals
  * certainty of the bound.
  */
object NumberQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G441: birthday-bound collision audit ───────────────────────────
    "q496_birthday_bound" -> ((s, dir) => {
      val widths = Seq(16, 20, 24, 28)
      val h = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          expr("md5_60(concat('bd:', cast(o_orderkey as string)))").as("h60"))
        .select(col("k"), col("h60"),
          explode(expr(s"array(${widths.mkString(", ")})")).as("b"))
        .withColumn("bucket", expr(
          "(case " + widths.map(b =>
            s"when b = $b then h60 div ${1L << (60 - b)}L").mkString(" ") +
            " end)"))
      val tot = Tables.orders(s, dir).agg(count(lit(1)).as("n_orders"))
      val perBucket = h.groupBy("b", "bucket").agg(count(lit(1)).as("cnt"))
      perBucket.groupBy("b")
        .agg(sum("cnt").as("n_keys"),
          count(lit(1)).as("buckets_used"),
          sum(expr("cnt * (cnt - 1) div 2")).as("colliding_pairs"),
          max("cnt").as("max_bucket"))
        .withColumn("expected_pairs_e4", expr(
          "(case " + widths.map(b =>
            s"when b = $b then n_keys * (n_keys - 1) div 2 * 10000 div ${1L << b}L")
            .mkString(" ") + " end)"))
        .withColumn("measured_vs_expected_e4", expr(
          "case when expected_pairs_e4 = 0L then -1L " +
            "else colliding_pairs * 10000 * 10000 div expected_pairs_e4 end"))
        .crossJoin(broadcast(tot))
        .withColumn("mass_ok", expr(
          "case when n_keys = n_orders then 1L else 0L end"))
        .select(col("b").cast("bigint").as("b"), col("n_keys"),
          col("buckets_used"), col("max_bucket"), col("colliding_pairs"),
          col("expected_pairs_e4"), col("measured_vs_expected_e4"),
          col("mass_ok"))
        .orderBy("b")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q496_birthday_bound" -> {
      val widths = Seq(16, 20, 24, 28)
      s"""WITH h AS (SELECT o_orderkey AS k,
        |    CAST('0x' || substr(md5('bd:' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15) AS BIGINT) AS h60,
        |    b.b
        |  FROM orders, (SELECT UNNEST([${widths.mkString(", ")}]) AS b) b),
        |bk AS (SELECT b,
        |    (CASE ${widths.map(b =>
             s"WHEN b = $b THEN h60 // ${1L << (60 - b)}").mkString(" ")} END)
        |      AS bucket
        |  FROM h),
        |pb AS (SELECT b, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
        |agg AS (SELECT b, SUM(cnt) AS n_keys, COUNT(*) AS buckets_used,
        |    SUM(cnt * (cnt - 1) // 2) AS colliding_pairs,
        |    MAX(cnt) AS max_bucket
        |  FROM pb GROUP BY b),
        |tot AS (SELECT COUNT(*) AS n_orders FROM orders)
        |SELECT CAST(b AS BIGINT) AS b, CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(buckets_used AS BIGINT) AS buckets_used,
        |  CAST(max_bucket AS BIGINT) AS max_bucket,
        |  CAST(colliding_pairs AS BIGINT) AS colliding_pairs,
        |  CAST((CASE ${widths.map(b =>
             s"WHEN b = $b THEN n_keys * (n_keys - 1) // 2 * 10000 // ${1L << b}")
             .mkString(" ")} END) AS BIGINT) AS expected_pairs_e4,
        |  CAST(CASE WHEN (CASE ${widths.map(b =>
             s"WHEN b = $b THEN n_keys * (n_keys - 1) // 2 * 10000 // ${1L << b}")
             .mkString(" ")} END) = 0 THEN -1
        |    ELSE colliding_pairs * 10000 * 10000 // (CASE ${widths.map(b =>
             s"WHEN b = $b THEN n_keys * (n_keys - 1) // 2 * 10000 // ${1L << b}")
             .mkString(" ")} END) END AS BIGINT) AS measured_vs_expected_e4,
        |  CAST(CASE WHEN n_keys = tot.n_orders THEN 1 ELSE 0 END AS BIGINT)
        |    AS mass_ok
        |FROM agg, tot ORDER BY b""".stripMargin
    }
  )
}
