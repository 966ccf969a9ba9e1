package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the eval/index surface (EvalQueries,
  * q179-q184): recall audit is bounded and the exact arm recomputes,
  * seasonal indices weighted-average back to parity, the bitmap count
  * equals a driver-side recount, the gain chart tiles the user base,
  * k-core peeling is monotone, and the churn labeler's windows are
  * disjoint by construction.
  */
class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q179 quantization recall: bounded, exact arm matches a driver-side recount") {
    val r = run("q179_quantization_recall").collect()(0)
    val (hits, k, recall) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k == 10 && hits >= 0 && hits <= k && recall == hits * 1000)
    // recompute the exact top-10 driver-side and check overlap with the
    // int8 arm recomputed the same way
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = vecs.find(_._1 == 0).get._2
    def cosR6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / math.sqrt(na) / math.sqrt(nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exact = vecs.filter(_._1 != 0)
      .map { case (id, v) => (id, cosR6(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    def quant(v: Array[Double]): (Array[Long], Long) = {
      val x6 = v.map(x => math.round(x * 1e6))
      val m6 = x6.map(math.abs).max
      val qs = x6.map(x =>
        if (m6 == 0) 0L else math.signum(x) * ((math.abs(x) * 254 + m6) / (2 * m6)))
      (qs, qs.map(x => x * x).sum)
    }
    val (qqs, qqq) = quant(q)
    val approx = vecs.filter(_._1 != 0).map { case (id, v) =>
      val (qs, qq) = quant(v)
      val dot = qs.indices.map(i => qs(i) * qqs(i)).sum
      val score = BigInt(dot).signum * ((BigInt(dot) * dot * BigInt(10).pow(12)) /
        (BigInt(qq) * qqq))
      (id, score)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    assert(hits == exact.intersect(approx).size.toLong)
  }

  test("q180 seasonal index: per-type weighted mean of indices is ~1e6 (mass parity)") {
    val rows = run("q180_seasonal_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, g) =>
      // exact identity: sum over dows of (n_dow * mean_dow) = total sum, so
      // the n-weighted SUM-ratio version of the index averages to 1e6 with
      // only floor-division slack (< 7 units per type)
      val nTot = g.map(_._3).sum
      val vTot = g.map(_._4).sum
      g.foreach { case (_, dow, n, sv, idx) =>
        assert(dow >= 1 && dow <= 7)
        val expect = (BigInt(sv) * nTot * 1000000) / (BigInt(n) * vTot)
        val signed = if (expect < 0) -((-expect)) else expect
        assert(BigInt(idx) == signed, s"$t dow $dow index")
      }
    }
  }

  test("q181 bitmap index: consistent, and the direct count recounts") {
    val r = run("q181_bitmap_index").collect()(0)
    assert(r.getAs[Boolean]("consistent"))
    val direct = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "user_id").distinct()
      .groupBy("user_id").count().filter(col("count") === 2).count()
    assert(r.getAs[Long]("n_direct") == direct)
    assert(r.getAs[Long]("n_bitmap") == direct)
  }

  test("q182 decile calibration: deciles tile users; lift mass conserves") {
    val rows = run("q182_decile_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == (1L to 10L).toSet)
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers)
    rows.foreach { case (_, nu, nc, conv, _) =>
      assert(nc <= nu)
      assert(conv == nc * 10000 / nu)
    }
    // NTILE balance: bucket sizes differ by at most 1
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
  }

  test("q183 k-core peel: censuses monotone non-increasing; round 0 is the pair table") {
    val rows = run("q183_kcore_peel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(0L, 1L, 2L, 3L))
    rows.sliding(2).foreach { case Array((_, n0, e0), (_, n1, e1)) =>
      assert(n1 <= n0 && e1 <= e0, "peeling can only shrink the graph")
    }
    val nPairs = FeatureQueries.dupPairsTable(spark, sf).count()
    assert(rows.head._3 == nPairs)
  }

  test("q184 churn label: buckets tile active-before users; rates recount") {
    val rows = run("q184_churn_label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val u = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(
        sum(when(to_date(col("ts")) < lit("2024-01-24").cast("date"), 1L).otherwise(0L)).as("f"),
        max(when(to_date(col("ts")) >= lit("2024-01-24").cast("date"), 1L).otherwise(0L)).as("a"))
      .filter(col("f") > 0)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum == u.length.toLong)
    val expect = u.groupBy { case (f, _) => 63 - java.lang.Long.numberOfLeadingZeros(f) }
      .map { case (b, g) => (b.toLong, (g.size.toLong, g.count(_._2 == 0L).toLong)) }
    rows.foreach { case (b, nu, nc, rate) =>
      val (eu, ec) = expect(b)
      assert(nu == eu && nc == ec, s"bucket $b")
      assert(rate == nc * 10000 / nu)
    }
  }
}
