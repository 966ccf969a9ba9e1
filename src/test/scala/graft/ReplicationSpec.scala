package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the replication-and-secrecy wave
  * (q483-q485): quorum grid replayed against the hypergeometric
  * closed form, CRDT certificates, Shamir reconstruction replayed.
  */
class ReplicationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q483 quorum grid: driver replay + exact theory diagonal") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    def ranks(k: Long, salt: String): Map[Int, Int] =
      (1 to 5).map(r => (r, md5_60(s"$salt:$k:$r"))).sortBy(t => (t._2, t._1))
        .zipWithIndex.map { case ((r, _), i) => (r, i + 1) }.toMap
    val disjoint = Array.ofDim[Long](6, 6)
    ks.foreach { k =>
      val (wr, rr) = (ranks(k, "w"), ranks(k, "r"))
      for (rq <- 1 to 5; wq <- 1 to 5)
        if (!(1 to 5).exists(r => wr(r) <= wq && rr(r) <= rq))
          disjoint(rq)(wq) += 1L
    }
    def binom(n: Int, kk: Int): Long =
      if (kk < 0 || kk > n) 0L
      else (1 to kk).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)
    val rows = run("q483_quorum_grid").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (rq, wq) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(r.getLong(2) == ks.length.toLong)
      assert(r.getLong(3) == disjoint(rq)(wq), s"($rq,$wq) replay bit-equal")
      assert(r.getLong(5) == binom(5 - wq, rq) * 10000L / binom(5, rq),
        "hypergeometric theory")
      assert(r.getLong(7) == 1L, "quorum certificate")
      if (rq + wq > 5) assert(r.getLong(3) == 0L, "pigeonhole: no disjoint")
    }
  }

  test("q484 CRDT G-counter: all five laws counted at 100%") {
    val rows = run("q484_crdt_gcounter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (7 to 11).foreach(i => assert(r.getLong(i) == 1L,
        s"law column $i holds on slot (${r.getString(0)}, ${r.getLong(1)})"))
      assert(r.getLong(5) == Seq(r.getLong(2), r.getLong(3), r.getLong(4)).max,
        "merged = slot-wise max")
      assert(r.getLong(5) == r.getLong(6), "merged equals truth")
    }
  }

  test("q485 Shamir: reconstruction replayed, all pairs agree") {
    import org.apache.spark.sql.functions._
    val p = 2147483647L
    val inv2 = (p + 1) / 2
    def md(x: Long): Long = ((x % p) + p) % p
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var rec = 0L
    o.foreach { case (k, cents) =>
      val sec = md(cents)
      val a = md(md5_60(s"coef:$k"))
      val (y1, y2, y3) = (md(sec + a), md(sec + 2 * a), md(sec + 3 * a))
      val r12 = md(2 * y1 - y2)
      val r23 = md(3 * y2 - 2 * y3)
      val r13 = md(md(3 * y1 - y3) * inv2)
      assert(r12 == sec && r23 == sec && r13 == sec,
        s"key $k: all three pairs reconstruct")
      rec += 1L
    }
    val Array(r) = run("q485_shamir").collect()
    assert(r.getLong(0) == rec)
    assert(r.getLong(1) == rec && r.getLong(2) == rec && r.getLong(3) == rec,
      "engine counts match the replay")
  }
}
