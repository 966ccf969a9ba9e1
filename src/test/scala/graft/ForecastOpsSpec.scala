package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the forecast-ops wave (q523–q526), plus a
  * full driver replay of the nDCG computation (both ranking arms in
  * BigInt arithmetic, bit-equal). */
class ForecastOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q523 reconciliation: per-region verdicts, coherent fields") {
    val rows = run("q523_hier_reconcile").collect()
    assert(rows.nonEmpty && rows.length <= 5, "one row per region")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, "test days present")
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L, "MAEs non-negative")
      assert(r.getLong(4) >= 0L, "incoherence gap non-negative")
      val winner = r.getString(5)
      assert(winner == (if (r.getLong(2) <= r.getLong(3)) "bottom_up"
                        else "direct"), "winner matches the MAEs")
    }
  }

  test("q524 ensemble: weights bounded, blend dominates when flagged") {
    val rows = run("q524_forecast_ensemble").collect()
    assert(rows.nonEmpty && rows.length <= 25, "one row per nation")
    rows.foreach { r =>
      val (wA, mA, mB, mE) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(wA >= 0L && wA <= 1000000L, "weight is an e6 proportion")
      assert(r.getLong(6) == (if (mE <= math.min(mA, mB)) 1L else 0L),
        "ens_beats_best consistent with the three MAEs")
    }
  }

  test("q525 nDCG: bit-equal to a BigInt driver replay of both arms") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("cast(embedding as array<double>)"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    val rest = e.filter(_._1 != 0L)
    // exact arm: cosineR6 = round(cos * 1e6) as the engine computes it
    def cosR6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    val exactTop = rest.map { case (id, v) => (id, cosR6(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val rel = exactTop.zipWithIndex.map { case (id, i) => id -> (10L - i) }.toMap
    // int8 arm: same quantizer + DECIMAL-exact score ordering in BigInt
    def quant(v: Array[Double]): (Array[Long], BigInt) = {
      val x6 = v.map(x => math.round(x * 1e6))
      val m6 = x6.map(math.abs).max
      val qs = x6.map(x => if (m6 == 0L) 0L
        else math.signum(x) * ((math.abs(x) * 254 + m6) / (2 * m6)))
      (qs, qs.map(x => BigInt(x) * x).sum)
    }
    val (qqs, qqq) = quant(q)
    val approxTop = rest.map { case (id, v) =>
      val (qs, qq) = quant(v)
      val dot = qs.zip(qqs).map { case (a, b) => BigInt(a) * b }.sum
      val score = dot.sign * (dot * dot * BigInt(1000000000000L) / (qq * qqq))
      (id, score)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val dcg = approxTop.zipWithIndex.map { case (id, i) =>
      rel.getOrElse(id, 0L) *
        math.round(1e6 / (math.log(i + 2.0) / math.log(2.0)))
    }.sum
    val idcg = (1 to 10).map(i =>
      (11L - i) * math.round(1e6 / (math.log(i + 1.0) / math.log(2.0)))).sum
    val Array(r) = run("q525_ndcg_retrieval").collect()
    assert(r.getLong(2) == dcg, "DCG bit-equal to the replay")
    assert(r.getLong(3) == idcg, "IDCG literal matches")
    assert(r.getLong(4) == dcg * 10000L / idcg, "nDCG e4 bit-equal")
    assert(r.getLong(1) == approxTop.count(rel.contains), "overlap count")
  }

  test("q526 Winkler: score bounded below by the width, shares in range") {
    val rows = run("q526_winkler_interval").collect()
    assert(rows.nonEmpty, "per-priority rows")
    rows.foreach { r =>
      val (qhat, cov, wMean, pen) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cov >= 0L && cov <= 10000L, "coverage is an e4 proportion")
      // mean winkler ≥ width (2q̂) up to the integer-div floor
      assert(wMean >= 2L * qhat - 1L, "penalties only add to the width")
      assert(pen >= 0L && pen <= 10000L, "penalty share is an e4 proportion")
    }
  }
}
