package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the empirical-validation wave (q471-q473):
  * the measured LSH S-curve's internal consistency, the
  * rerandomization test's add-one arithmetic, and a full driver-side
  * replay of the Needleman-Wunsch DP over every user.
  */
class EmpiricalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q471 S-curve: buckets ordered, theory monotone, rates bounded") {
    val rows = run("q471_lsh_scurve").collect()
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted), "bucket order")
    rows.foreach { r =>
      val (n, c, m, t) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c >= 0L && c <= n, "collisions within pair count")
      assert(m >= 0L && m <= 10000L && t >= 0L && t <= 10000L)
      assert(m == c * 10000L / n, "measured rate arithmetic")
    }
    // P(J) is monotone and buckets partition J, so bucket-mean theory is
    // monotone too (up to the 1-unit div truncation)
    rows.map(_.getLong(4)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1L, "theory curve monotone")
      case _           =>
    }
    // closed-form anchors: J >= 0.90 gives P >= 0.8817, J >= 0.95 gives
    // P >= 0.9656 (1 - (1 - J^4)^2 at the bucket's lower edge)
    rows.filter(_.getLong(0) == 18L).foreach(r => assert(r.getLong(4) >= 8700L))
    rows.filter(_.getLong(0) == 19L).foreach(r => assert(r.getLong(4) >= 9600L))
  }

  test("q472 rerandomization: add-one p-value arithmetic exact") {
    val Array(r) = run("q472_permutation_test").collect()
    val (dObs, dMax, nPerm, nGe, p, rej) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nPerm == 100L, "all 100 re-randomizations survive")
    assert(nGe >= 0L && nGe <= nPerm)
    assert(dObs >= 0L && dMax >= 0L)
    assert(p == (1L + nGe) * 10000L / (nPerm + 1L), "add-one p-value")
    assert(rej == (if (p <= 500L) 1L else 0L))
  }

  test("q473 NW alignment: full DP replayed in the driver, bit-equal") {
    val pat = Seq("signup", "view", "click", "view", "click", "purchase")
    val m = pat.length
    def nw(ets: Seq[String]): Long = {
      var row = (0 to m).map(j => -j.toLong).toArray
      ets.foreach { et =>
        val nr = new Array[Long](m + 1)
        nr(0) = row(0) - 1L
        var j = 1
        while (j <= m) {
          nr(j) = math.max(math.max(row(j) - 1L, nr(j - 1) - 1L),
            row(j - 1) + (if (et == pat(j - 1)) 2L else -1L))
          j += 1
        }
        row = nr
      }
      row(m)
    }
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    val scores = ev.groupBy(_._1).map { case (_, xs) =>
      nw(xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).toSeq)
    }.toSeq
    val Array(r) = run("q473_nw_alignment").collect()
    assert(r.getLong(0) == scores.size.toLong, "n_users")
    assert(r.getLong(1) == ev.length.toLong, "n_events")
    assert(r.getLong(2) == scores.sum, "score_total bit-equal")
    assert(r.getLong(4) == scores.max, "score_max")
    assert(r.getLong(5) == scores.min, "score_min")
    assert(r.getLong(6) == 0L && r.getLong(7) == 0L, "score bounds certified")
  }
}
