package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the lakehouse surface (LakeQueries,
  * q195-q199): the MIPS bound never prunes a true top-k member, the
  * evolved-schema read balances, blocking quality is a valid
  * precision/recall pair, basket lift recounts, and the JSON round-trip
  * equals the relational aggregate.
  */
class LakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q195 MIPS prune: sound — no prunable vector can be in the top-k") {
    val r = run("q195_mips_prune").collect()(0)
    val (n, dotK, prunable, e4) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && prunable >= 0 && prunable <= n)
    assert(e4 == prunable * 10000 / n)
    // soundness: recompute dots; every vector with qq*vv < dot_k^2 must
    // have dot < dot_k (Cauchy-Schwarz)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).map(x => math.round(x * 1e6)).toArray))
    val q = vecs.find(_._1 == 0).get._2
    val qq = q.map(x => x * x).sum
    vecs.filter(_._1 != 0).foreach { case (_, v) =>
      val dot = v.indices.map(i => v(i) * q(i)).sum
      val vv = v.map(x => x * x).sum
      if (dotK > 0 && BigInt(qq) * vv < BigInt(dotK) * dotK)
        assert(dot < dotK, "norm bound must be sound")
    }
  }

  test("q196 schema evolution: generations balance; late column only in gen 2") {
    val rows = run("q196_schema_evolution").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == total)
    val (g1, g2) = (rows(0), rows(1))
    assert(g1._3 == 0 && g1._4 == 0, "gen 1 predates the price column")
    assert(g2._3 == g2._2, "every gen-2 row carries the price")
  }

  test("q197 blocking quality: valid precision/recall against the declared queries") {
    val r = run("q197_blocking_quality").collect()(0)
    val (ne, na, nc, p, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nc <= ne && nc <= na)
    assert(p == nc * 10000 / na && rec == nc * 10000 / ne)
    assert(p >= 0 && p <= 10000 && rec >= 0 && rec <= 10000)
  }

  test("q198 basket affinity: every emitted pair recounts; lift formula exact") {
    val rows = run("q198_basket_affinity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = items.map(_._1).distinct.length.toLong
    val byPart = items.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (pa, pb, co, na, nb, lift) =>
      assert(pa < pb && co >= 5)
      val (sa, sb) = (byPart(pa), byPart(pb))
      assert(na == sa.size.toLong && nb == sb.size.toLong)
      assert(co == sa.intersect(sb).size.toLong)
      assert(BigInt(lift) == BigInt(co) * nOrders * 10000 / (BigInt(na) * nb))
    }
  }

  test("q199 JSON round-trip: equals the direct relational aggregate") {
    val got = run("q199_json_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("revenue2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct, "serialize-parse-explode is the identity")
  }
}
