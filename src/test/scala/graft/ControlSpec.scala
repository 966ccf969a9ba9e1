package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the control-and-estimation wave
  * (q401-q404): a driver replay of the EWMA recurrence, the
  * coordination set-identity, Good-Turing mass conservation, and the
  * WAND safety guarantees.
  */
class ControlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q401 EWMA: driver replay of the fold and the trained limits") {
    val rows = run("q401_ewma_control").collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("event_type").as("t"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val d0 = daily.map(_._1).min
    val d1 = daily.map(_._1).max
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == nDays)
      val xs = (0L until nDays).map { i =>
        daily.count(e => e._2 == t &&
          java.time.temporal.ChronoUnit.DAYS.between(d0, e._1) == i).toLong
      }
      val icut = nDays * 6 / 10
      val tr = xs.take(icut.toInt)
      val mu = tr.sum / tr.length
      val variance = (tr.length * tr.map(x => x * x).sum - tr.sum * tr.sum) /
        (tr.length.toLong * tr.length)
      val sigma = math.floor(math.sqrt(variance.toDouble)).toLong
      assert(r.getLong(2) == mu && r.getLong(3) == sigma)
      val (lo, hi) = (mu - 3 * sigma, mu + 3 * sigma)
      var e = -1L; var nf = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        e = if (e == -1L) x else e + (x - e) / 8
        if (i >= icut && (e > hi || e < lo)) nf += 1
      }
      assert(r.getLong(6) == nf, s"flag count for $t must match the replay")
      assert(r.getLong(7) == e, s"final EWMA for $t must match the replay")
    }
  }

  test("q402 coordination: sample of intersection is intersection of samples") {
    val Array(r) = run("q402_coordinated_sample").collect()
    val (nA, nB, nBoth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (sA, sB, sBoth) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nBoth <= math.min(nA, nB) && sBoth <= math.min(sA, sB))
    assert(sA <= nA && sB <= nB && sBoth <= nBoth)
    // ~10% coordinated rate on both margins (binomial slack)
    assert(sA * 10 >= nA / 2 && sA * 10 <= nA * 2)
    val (jEx, jEst, err) = (r.getLong(6), r.getLong(7), r.getLong(8))
    assert(err == math.abs(jEst - jEx))
    assert(jEx >= 0 && jEx <= 10000 && jEst >= 0 && jEst <= 10000)
  }

  test("q403 Good-Turing: ladder identities and mass bounds") {
    val rows = run("q403_good_turing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { case (_, nTypes, gt, actual) =>
      assert(nTypes > 0)
      assert(gt >= 0 && actual >= 0)
    }
    val unseen = rows.head
    assert(unseen._3 <= 10000 && unseen._4 <= 10000)
    // the trigram grain has a real tail: GT predicts nonzero unseen
    // mass and heldout actually contains unseen trigrams
    assert(unseen._3 > 0 && unseen._4 > 0)
  }

  test("q404 WAND: zero violations, survivor top-10 equals exact") {
    val Array(r) = run("q404_wand_pruning").collect()
    val (nCand, nPruned, nViol) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCand > 10)
    assert(nViol == 0, "a pruned doc scoring >= theta breaks the UB guarantee")
    assert(nPruned < nCand)
    assert(r.getLong(4) == nPruned * 10000 / nCand)
    assert(r.getLong(7) == 1L, "survivor top-10 must equal the exact top-10")
    assert(r.getLong(5) == r.getLong(6))
  }
}
