package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the master-data surface (MasterQueries,
  * q254-q256): survivorship picks recompute per cluster, the top-k
  * merge is provably lossless, and bitemporal resolution shows
  * corrections exactly when T passes the correction time.
  */
class MasterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q254 golden record: field rules recompute on every cluster") {
    val rows = run("q254_golden_record").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val cc = FeatureQueries.componentsTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getLong(3)))).toMap
    val byComp = cc.groupBy(_._2)
    assert(rows.length == byComp.size, "one golden record per cluster")
    rows.foreach { case (comp, n, textId, textChars, langMode, srcMin, totChars) =>
      val members = byComp(comp).map(m => m._1 -> docs(m._1))
      assert(n == members.length)
      val best = members.minBy { case (id, (_, _, ch)) => (-ch, id) }
      assert(textId == best._1 && textChars == best._2._3)
      val mode = members.groupBy(_._2._1).toSeq
        .minBy { case (l, ms) => (-ms.length, l) }._1
      assert(langMode == mode)
      assert(srcMin == members.map(_._2._2).min)
      assert(totChars == members.map(_._2._3).sum)
    }
  }

  test("q255 top-k merge audit: all five ranks equal (k-safety holds)") {
    val rows = run("q255_topk_merge_audit").collect()
      .map(r => (r.getLong(0), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq.sorted == (1L to 5L))
    assert(rows.forall(_._2), "per-bucket top-k merge is lossless")
  }

  test("q256 bitemporal: corrections visible iff T past correction time") {
    val rows = run("q256_bitemporal_asof").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (pk, version, priceC, isCorr) =>
      assert(version == 1, "V=2024-02-15 lies in the second valid period")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$pk:1".getBytes("UTF-8"))
      val hex2 = f"${h(0) & 0xff}%02x" // first two hex chars of md5("pk:1")
      val wasCorrected = java.lang.Long.parseLong(hex2, 16) % 3 == 0
      assert(isCorr == wasCorrected,
        s"part $pk correction visibility matches the hash rule")
      val base = Tables.part(spark, sf).filter(col("p_partkey") === pk)
        .select(expr("cast(round(p_retailprice * 100) as bigint)"))
        .collect()(0).getLong(0)
      assert(priceC == base + 100 + (if (wasCorrected) 55 else 0))
    }
  }
}
