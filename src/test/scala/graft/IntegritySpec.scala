package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the integrity surface (IntegrityQueries,
  * q219-q220): the leakage census covers every dup pair, and the CSV
  * round-trip preserves adversarial payloads byte-for-byte.
  */
class IntegritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q219 cross-split leakage: census covers every pair; crosses flag correct") {
    val rows = run("q219_crosssplit_leakage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val nPairs = FeatureQueries.dupPairsTable(spark, sf).count()
    assert(rows.map(_._3).sum == nPairs, "every dup pair lands in exactly one cell")
    rows.foreach { case (a, b, _, crosses) =>
      assert(crosses == (a != b))
      assert(Set("train", "val", "test").contains(a))
      assert(Set("train", "val", "test").contains(b))
    }
  }

  test("q220 CSV quoting: checksums equal the direct relational computation") {
    val got = run("q220_csv_quoting").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val direct = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        expr("""concat('v,"', cast(o_orderkey as string), '",x,', o_orderstatus,
               |       '"', repeat(',', cast(o_orderkey % 3 as int)))""".stripMargin).as("p"))
      .groupBy("st")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr(
          "cast(conv(substring(md5(concat(cast(k as string), ':', p)), 1, 12), 16, 10) as decimal(38,0))"))
          .as("checksum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(got == direct, "CSV writer-parser round-trip is the identity on adversarial payloads")
  }
}
