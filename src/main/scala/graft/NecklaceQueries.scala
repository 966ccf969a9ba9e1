package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Necklace wave (round 10, hundred-fourth wave): Burnside/Pólya by
  * enumeration, on real weekly rhythms.
  *
  * q519 proves Burnside's lemma where it is checkable whole: all 2⁶
  * six-bead and all 2⁷ seven-bead two-colorings are enumerated, each
  * reduced to its canonical rotation (min over all cyclic shifts, in
  * pure integer arithmetic), and the distinct-class counts come out
  * EXACTLY at the lemma's averages — (2⁶+2+4+8+4+2)/6 = 14 and
  * (2⁷+6·2)/7 = 20 — matching the gcd-power formula term for term.
  * The machinery then runs on real data: every customer's weekly
  * rhythm (which days of week they ever ordered, q468's anchor
  * arithmetic, a 7-bit bitmap) collapses to its rotation class — the
  * shift-invariant shape of a weekly habit, which is exactly what a
  * seasonality clusterer should bucket by — and the census reports
  * how many of the 20 possible classes the corpus realizes and how
  * concentrated they are.
  */
object NecklaceQueries {

  /** canonical rotation class of an n-bit necklace, dialect-generic. */
  private def canon(v: String, n: Int, idiv: String): String = {
    val rots = (0 until n).map { r =>
      if (r == 0) s"($v)"
      else s"(($v) $idiv ${1 << r} + (($v) % ${1 << r}) * ${1 << (n - r)})"
    }
    s"least(${rots.mkString(", ")})"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G464: Burnside necklace classes, proven + applied ──────────────
    "q519_necklace_burnside" -> ((s, dir) => {
      def classes(n: Int): DataFrame =
        Tables.orders(s, dir).sparkSession.range(0, 1L << n)
          .select(expr(canon("id", n, "div")).as("c"))
          .agg(countDistinct("c").as(s"n_classes"))
      val e6 = classes(6).select(col("n_classes").as("n6_classes"))
      val e7 = classes(7).select(col("n_classes").as("n7_classes"))
      // real weekly rhythms: bitmap of active days-of-week per customer
      val rhythms = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"),
          expr("pmod(datediff(cast(o_orderdate as date), date '1970-01-05'), 7)")
            .as("dow"))
        .distinct()
        .groupBy("c")
        .agg(sum(expr("(case dow when 0 then 1L when 1 then 2L " +
          "when 2 then 4L when 3 then 8L when 4 then 16L when 5 then 32L " +
          "else 64L end)")).as("bm"))
        .withColumn("cls", expr(canon("bm", 7, "div")))
      val perClass = rhythms.groupBy("cls").agg(count(lit(1)).as("n"))
      val dataAgg = perClass.agg(count(lit(1)).as("n_observed_classes"),
        sum("n").as("n_customers"), max("n").as("top_class_n"))
      e6.crossJoin(e7).crossJoin(dataAgg)
        .select(lit(64L).as("n6_colorings"),
          col("n6_classes").cast("bigint").as("n6_classes"),
          expr("case when n6_classes = 14 then 1L else 0L end")
            .as("burnside6_ok"),
          lit(128L).as("n7_colorings"),
          col("n7_classes").cast("bigint").as("n7_classes"),
          expr("case when n7_classes = 20 then 1L else 0L end")
            .as("burnside7_ok"),
          col("n_customers"), col("n_observed_classes"),
          expr("case when n_observed_classes <= 20L then 1L else 0L end")
            .as("class_bound_ok"),
          col("top_class_n"),
          expr("top_class_n * 10000 div n_customers").as("top_share_e4"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q519_necklace_burnside" -> {
      s"""WITH e6 AS (SELECT COUNT(DISTINCT ${canon("v", 6, "//")})
        |    AS n6_classes
        |  FROM (SELECT UNNEST(range(0, 64)) AS v)),
        |e7 AS (SELECT COUNT(DISTINCT ${canon("v", 7, "//")}) AS n7_classes
        |  FROM (SELECT UNNEST(range(0, 128)) AS v)),
        |dows AS (SELECT DISTINCT o_custkey AS c,
        |    ((date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
        |      % 7) + 7) % 7 AS dow
        |  FROM orders),
        |rhythms AS (SELECT c, SUM(CASE dow WHEN 0 THEN 1 WHEN 1 THEN 2
        |    WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32
        |    ELSE 64 END) AS bm
        |  FROM dows GROUP BY c),
        |cls AS (SELECT ${canon("bm", 7, "//")} AS cls FROM rhythms),
        |pc AS (SELECT cls, COUNT(*) AS n FROM cls GROUP BY cls),
        |da AS (SELECT COUNT(*) AS n_observed_classes, SUM(n) AS n_customers,
        |    MAX(n) AS top_class_n FROM pc)
        |SELECT CAST(64 AS BIGINT) AS n6_colorings,
        |  CAST(e6.n6_classes AS BIGINT) AS n6_classes,
        |  CAST(CASE WHEN e6.n6_classes = 14 THEN 1 ELSE 0 END AS BIGINT)
        |    AS burnside6_ok,
        |  CAST(128 AS BIGINT) AS n7_colorings,
        |  CAST(e7.n7_classes AS BIGINT) AS n7_classes,
        |  CAST(CASE WHEN e7.n7_classes = 20 THEN 1 ELSE 0 END AS BIGINT)
        |    AS burnside7_ok,
        |  CAST(da.n_customers AS BIGINT) AS n_customers,
        |  CAST(da.n_observed_classes AS BIGINT) AS n_observed_classes,
        |  CAST(CASE WHEN da.n_observed_classes <= 20 THEN 1 ELSE 0 END
        |    AS BIGINT) AS class_bound_ok,
        |  CAST(da.top_class_n AS BIGINT) AS top_class_n,
        |  CAST(da.top_class_n * 10000 // da.n_customers AS BIGINT)
        |    AS top_share_e4
        |FROM e6, e7, da""".stripMargin
    }
  )
}
