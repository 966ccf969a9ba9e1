package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integrity operators (round 9, eleventh wave): cross-split duplicate
  * leakage and the CSV quoting round-trip.
  *
  * Reference intent: the reference's train/test discipline is a date
  * cutoff in pandas and its CSV is well-behaved
  * (services/training-service/app/train_utils.py:94-99 TimeSeriesSplit,
  * services/data-producer). At corpus scale the
  * split meets the dup graph (near-identical docs landing on both
  * sides of a split leak labels no date cutoff sees) and the CSV
  * meets fields with embedded delimiters — both stated here as
  * oracle-gated audits.
  */
object IntegrityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G164: cross-split duplicate leakage (dedup × split interplay) ──
    // Split-then-dedup leaks: a near-dup pair straddling train/test
    // hands the model its test answers. The audit crosses the landed
    // q23 pair snapshot with q51's md5-nibble split function and
    // censuses pairs by (split_a, split_b) — the off-diagonal mass is
    // leakage a date or random split cannot see (dedup must run
    // BEFORE splitting; q64's clusters make that exact). Two broadcast
    // hash joins of the tiny split map onto the bounded pair table.
    "q219_crosssplit_leakage" -> ((s, dir) => {
      val split = Tables.documents(s, dir).select(col("doc_id"),
        expr("""CASE WHEN substring(md5(cast(doc_id as string)), 1, 1) <= 'b' THEN 'train'
               |     WHEN substring(md5(cast(doc_id as string)), 1, 1) <= 'd' THEN 'val'
               |     ELSE 'test' END""".stripMargin).as("split"))
      FeatureQueries.dupPairsTable(s, dir)
        .select("doc_a", "doc_b")
        .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
        .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("crosses", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    }),

    // ── G165: CSV quoting round-trip (embedded-delimiter integrity) ────
    // Fields containing the delimiter, the quote char, or leading
    // zeros are where CSV pipelines silently corrupt data. The fixture
    // constructs adversarial strings deterministically from orders
    // (commas, double quotes, quote-comma runs), writes them through
    // Spark's quoting CSV writer, reads them back with the matching
    // parser, and emits a per-status ledger: row count + an order-
    // independent DECIMAL checksum of md5(key:payload). Green means
    // writer∘parser ≡ identity byte-for-byte; the oracle computes the
    // same checksum from the relational source without ever touching
    // CSV. No newlines in payloads — multiLine CSV is non-splittable,
    // and a 100-TB feed that needs it has already lost (documented
    // trade).
    "q220_csv_quoting" -> ((s, dir) => {
      val payload = expr(
        """concat('v,"', cast(o_orderkey as string), '",x,', o_orderstatus,
          |       '"', repeat(',', cast(o_orderkey % 3 as int)))""".stripMargin)
      val src = PipelineQueries.cachedFixture(s"csvq|$dir") { work =>
        Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            payload.as("p"))
          .repartition(8)
          .write.option("header", "true").mode("overwrite").csv(s"$work/src")
      } + "/src"
      s.read.option("header", "true")
        .schema(StructType(Seq(
          StructField("k", LongType), StructField("st", StringType),
          StructField("p", StringType))))
        .csv(src)
        .groupBy("st")
        .agg(count(lit(1)).as("n_rows"),
          sum(expr(
            "cast(conv(substring(md5(concat(cast(k as string), ':', p)), 1, 12), 16, 10) as decimal(38,0))"))
            .as("checksum"))
        .orderBy("st")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q219_crosssplit_leakage" -> {
      val q23 = TextQueries.oracleSql("q23_minhash_dup_pairs")
      s"""WITH p AS (SELECT doc_a, doc_b FROM ($q23)),
         |sp AS (SELECT doc_id,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT a.split AS split_a, b.split AS split_b,
         |       COUNT(*) AS n_pairs, a.split != b.split AS crosses
         |FROM p JOIN sp a ON a.doc_id = p.doc_a
         |       JOIN sp b ON b.doc_id = p.doc_b
         |GROUP BY 1, 2, 4 ORDER BY 1, 2""".stripMargin
    },

    "q220_csv_quoting" ->
      """WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |               'v,"' || CAST(o_orderkey AS VARCHAR) || '",x,' ||
        |               o_orderstatus || '"' ||
        |               repeat(',', CAST(o_orderkey % 3 AS INT)) AS p
        |             FROM orders)
        |SELECT st, COUNT(*) AS n_rows,
        |       SUM(CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || p),
        |                 1, 12) AS BIGINT) AS HUGEINT)) AS checksum
        |FROM src GROUP BY st ORDER BY st""".stripMargin
  )
}
