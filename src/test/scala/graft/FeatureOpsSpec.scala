package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the feature-engineering-ops wave (q540–q542). */
class FeatureOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q540 LOO encoding replayed per row; a row never sees its own label") {
    import spark.implicits._
    val od = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("g"), $"o_orderpriority".as("pr"),
        $"o_orderkey".cast("long").as("ok"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
      .as[(Long, String, Long, Long)].collect()
    val p = od.map(_._4).sum / od.length
    val groups = od.groupBy(r => (r._1, r._2))
    val replay = groups.map { case ((g, pr), rows) =>
      val sG = rows.map(_._4).sum
      val nG = rows.length
      val encs = rows.map { case (_, _, ok, y) =>
        ok -> ((sG - y + 20 * p) / (nG - 1 + 20)) }
      // leakage direction: within a group the encoding is strictly
      // non-increasing in the row's own label (removing a bigger y
      // leaves less sum) — the signature of a true leave-one-out
      val encMap = encs.toMap
      rows.sortBy(_._4).map(r => encMap(r._3)).sliding(2).foreach {
        case Array(lo, hi) => assert(lo >= hi, s"($g,$pr) LOO monotonicity")
        case _ => ()
      }
      (g, pr) -> (nG.toLong, encs.map(_._2).min, encs.map(_._2).max,
        encs.map { case (ok, e) => md5_60(s"$ok:$e") }.reduce(_ ^ _))
    }
    val got = run("q540_target_encoding").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (k, v) => assert(got(k) == v, s"group $k") }
  }

  /** Pure-Scala replica of graft.ops.FixedLn (same as MonitorOpsSpec). */
  private def lnE9(hi: Long, lo: Long): Long = {
    val r = hi * 1000000000L / lo
    val k = (19 to 1 by -1).find(kk => r >= (1L << kk) * 1000000000L).getOrElse(0)
    val r2 = r / (1L << k)
    val z = (r2 - 1000000000L) * 1000000000L / (r2 + 1000000000L)
    val z2 = z * z / 1000000000L
    val z3 = z * z2 / 1000000000L
    val z5 = z3 * z2 / 1000000000L
    val z7 = z5 * z2 / 1000000000L
    val z9 = z7 * z2 / 1000000000L
    val z11 = z9 * z2 / 1000000000L
    val z13 = z11 * z2 / 1000000000L
    k * 693147181L + 2 * (z + z3 / 3 + z5 / 5 + z7 / 7 + z9 / 9 + z11 / 11 + z13 / 13)
  }

  test("q541 MI replayed from raw counts; near-non-negative; sorted") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .select(expr("case when l_returnflag = 'R' then 1L else 0L end").as("y"),
        $"o_orderpriority".as("f0"),
        expr("cast(cast(l_quantity as bigint) div 10 as string)").as("f1"),
        $"l_linestatus".as("f2"),
        expr("cast(month(to_date(l_shipdate)) as string)").as("f3"))
      .as[(Long, String, String, String, String)].collect()
    val feats = Map("priority" -> 1, "qty_decade" -> 2, "linestatus" -> 3,
      "ship_month" -> 4)
    val replay = feats.map { case (name, fi) =>
      val xs = rows.map(r => (r.productElement(fi).asInstanceOf[String], r._1))
      val n = xs.length.toLong
      val nxy = xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val nx = xs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val ny = xs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
      val terms = nxy.map { case ((x, y), c) =>
        val (pnum, pden) = (c * n, nx(x) * ny(y))
        val sc = math.max(1L, math.max(pnum, pden) / 1000000L)
        val hi = math.max(pnum, pden) / sc
        val lo = math.max(1L, math.min(pnum, pden) / sc)
        val l = lnE9(hi, lo)
        c * (if (pnum >= pden) l else -l)
      }
      name -> (nxy.size.toLong, n, terms.sum / n)
    }
    val got = run("q541_mutual_information").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == feats.keySet)
    got.foreach { case (name, v) => assert(replay(name) == v, name) }
    // MI >= 0 up to the documented fixed-point truncation (~1e-5 nats)
    got.foreach { case (n, (_, _, mi)) => assert(mi >= -10000L, n) }
    assert(got.map(_._2._3).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true }, "sorted by MI desc")
  }

  test("q542 Huber IRLS replayed bit-equal in BigInt") {
    import spark.implicits._
    val nd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".cast("long").as("g"),
        expr("datediff(to_date(o_orderdate), date '1970-01-01')").as("dn"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))").as("y"))
      .as[(Long, Long, Long)].collect()
    val d0 = nd.map(_._2).min
    def sdiv(a: BigInt, b: BigInt): BigInt = if (a >= 0) a / b else -((-a) / b)
    // interpolated median of 2·values (the percentile ×2 idiom): exact
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted.map(_ * 2)
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    def wols(rows: Seq[(Long, Long, Long)]): (Long, Long) = { // (w, x, y)
      val (sw, swx) = (BigInt(rows.map(_._1).sum), BigInt(rows.map(r => r._1 * r._2).sum))
      val swy = rows.map(r => BigInt(r._1) * r._3).sum
      val swxy = rows.map(r => BigInt(r._1) * r._2 * r._3).sum
      val swxx = BigInt(rows.map(r => r._1 * r._2 * r._2).sum)
      val bnum = sw * swxy - swx * swy
      val bden = (sw * swxx - swx * swx).max(BigInt(1))
      val b = sdiv(bnum * 1000000, bden)
      val a = sdiv(swy * 1000000 - b * swx, sw)
      (b.toLong, a.toLong)
    }
    val replay = nd.groupBy(_._1).map { case (g, rs) =>
      val xs = rs.map(r => (r._2 - d0, r._3)) // (x, y)
      val (b0, a0) = wols(xs.map { case (x, y) => (1L, x, y) })
      def round(b: Long, a: Long): (Seq[(Long, Long, Long)], Long) = {
        val absr = xs.map { case (x, y) =>
          (x, y, math.abs(y - sdiv(BigInt(a) + BigInt(b) * x, 1000000).toLong)) }
        val m2 = med2(absr.map(_._3).toSeq)
        (absr.map { case (x, y, r) =>
          val w = if (r == 0) 1000000L else math.min(1000000L, m2 * 1000000L / r)
          (w, x, y)
        }.toSeq, m2)
      }
      val (w1, _) = round(b0, a0)
      val (b1, a1) = wols(w1)
      val (w2, m2b) = round(b1, a1)
      val (b2, _) = wols(w2)
      g -> (xs.length.toLong, b0, b2,
        w2.count(_._1 < 1000000L).toLong, m2b / 2)
    }
    val got = run("q542_huber_trend").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == replay.keySet)
    replay.foreach { case (g, v) =>
      assert(got(g) == v, s"nation $g: replay $v vs ${got(g)}") }
  }
}
