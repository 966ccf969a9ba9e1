package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sampling-economics and curve waves
  * (q457-q461): bound coverage, Hilbert reference vectors, LZ78
  * driver replay, rate-distortion monotonicity, paradox-census
  * closure.
  */
class SamplingCurveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q457 sampling bounds: both cover, EB structure sane") {
    val Array(r) = run("q457_hoeffding_sample").collect()
    assert(r.getLong(1) > 0 && r.getLong(1) < r.getLong(0))
    assert(r.getLong(8) == 1L, "Hoeffding covers the true mean")
    assert(r.getLong(9) == 1L, "EB covers the true mean")
    assert(r.getLong(7) == r.getLong(5) + r.getLong(6), "EB = t1 + t2")
    assert(r.getLong(4) > 0 && r.getLong(5) > 0 && r.getLong(6) > 0)
    // data respects the design domain bound [0, 6e7] cents
    val mx = Tables.orders(spark, sf)
      .selectExpr("max(cast(round(o_totalprice * 100) as bigint)) m")
      .collect()(0).getLong(0)
    assert(mx <= 60000000L, s"domain bound: $mx")
  }

  test("q458 Hilbert: reference vectors, page accounting sane") {
    // canonical xy2d reference (flip with n-1), same as the engine fold
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L); var s = 512L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 1023 - x; y = 1023 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val pts = Seq((0L, 0L), (3L, 5L), (100L, 900L), (1023L, 0L),
      (512L, 512L), (1023L, 1023L), (7L, 7L))
    val df = spark.createDataFrame(pts).toDF("x0", "y0")
      .selectExpr("x0", "y0", s"${CurveQueries.hilbertD("x0", "y0")} as hd")
    df.collect().foreach { row =>
      val want = ref(row.getLong(0), row.getLong(1))
      assert(row.getLong(2) == want,
        s"hilbert(${row.getLong(0)},${row.getLong(1)}) = ${row.getLong(2)}, want $want")
    }
    // distinct d over the full first 4x4 block covers 0..15 exactly
    val block = spark.createDataFrame(
      for { x <- 0L to 3L; y <- 0L to 3L } yield (x, y)).toDF("x0", "y0")
      .selectExpr(s"${CurveQueries.hilbertD("x0", "y0")} as hd")
      .collect().map(_.getLong(0)).sorted
    assert(block.toSeq == (0L to 15L),
      "the curve visits each cell of a dyadic block exactly once")

    run("q458_hilbert_layout").collect().foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1)
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1),
        "pages never exceed rows")
      assert(r.getLong(4) + r.getLong(5) <= 1L)
    }
  }

  test("q459 LZ78: bounds hold, driver replay agrees") {
    val rows = run("q459_lz_complexity").collect()
    rows.foreach { r =>
      assert(r.getLong(7) == 0L, "phrases <= tokens everywhere")
      assert(r.getLong(4) <= 10000L && r.getLong(5) >= 1L)
    }
    // replay every document's LZ78 fold
    val docs = Tables.documents(spark, sf)
      .selectExpr("lower(trim(text)) as t").collect().map(_.getString(0))
    var phrases = 0L
    docs.foreach { t =>
      val ts = t.split("\\s+").filter(_.nonEmpty)
      if (ts.nonEmpty) {
        val dict = scala.collection.mutable.Set[String]()
        var cur = ""
        ts.foreach { tok =>
          val cand = if (cur.isEmpty) tok else cur + " " + tok
          if (dict.contains(cand)) cur = cand
          else { dict += cand; phrases += 1; cur = "" }
        }
        if (cur.nonEmpty) phrases += 1
      }
    }
    assert(rows.map(_.getLong(3)).sum == phrases,
      s"replayed phrase total: $phrases")
  }

  test("q460 rate-distortion: MSE strictly decreasing, step bound holds") {
    val rows = run("q460_bitwidth_sweep").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(6) == 1L, "per-value step bound"))
    val mses = rows.map(_.getLong(3))
    assert(mses.zip(mses.tail).forall { case (a, b) => a > b },
      "more bits, strictly less distortion")
    // the 6dB/bit law is a HIGH-RESOLUTION result: at 2 bits the
    // quantizer saturates (unit-norm embeddings have per-dim sigma
    // ~0.125, almost everything truncates to level 0) and the first
    // ratio is only ~3x; by 6->8 bits the ~16x law emerges. Assert
    // the regime shape, not a uniform bracket.
    rows.dropRight(1).foreach(r => assert(r.getLong(7) > 120L,
      s"each 2 bits must help: ${r.getLong(7)}"))
    val highRes = rows.find(_.getLong(0) == 6L).get.getLong(7)
    assert(highRes >= 800L && highRes <= 3200L,
      s"6->8-bit ratio should approach 16x: $highRes")
  }

  test("q461 Simpson census: closure and sentinel discipline") {
    val Array(r) = run("q461_simpsons_paradox").collect()
    assert(r.getLong(0) == 300L, "C(25,2) nation pairs")
    assert(r.getLong(1) == 5L, "five priority strata")
    assert(r.getLong(2) <= r.getLong(3),
      "full paradoxes are a subset of majority flips")
    if (r.getLong(2) == 0L)
      assert(r.getLong(5) == -1L, "no-paradox sentinel")
    else {
      val p = r.getLong(5)
      assert(p >= 1L && p / 100 < p % 100, "pair encoded ga*100+gb, ga<gb")
    }
  }
}
