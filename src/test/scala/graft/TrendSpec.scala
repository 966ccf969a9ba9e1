package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the trend wave (TrendQueries, q283-q286):
  * Mann-Kendall S bounds and tie identity, the Holt fold matches a
  * driver-side integer recurrence, seasonal strength is bounded, and
  * anomaly episodes are disjoint spans of genuinely-alerting days.
  */
class TrendSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q283 Mann-Kendall: |S| bounded by pair count, var18 positive, flag consistent") {
    val rows = run("q283_mann_kendall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, var18, dir, sig) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      val pairs = n * (n - 1) / 2
      assert(math.abs(s) <= pairs, "S exceeds the number of day pairs")
      assert(var18 > 0, "tie-corrected variance must be positive for non-constant series")
      assert(dir == math.signum(s))
      assert(sig == (180000 * s * s > 38416 * var18))
    }
  }

  test("q284 Holt: fold matches a driver-side replay of the integer recurrence") {
    def sdiv(n: Long, d: Long): Long = if (n >= 0) n / d else -((-n) / d)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((count(lit(1)) * 100).as("x2"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var l = xs.head; var b = 0L
      for (x <- xs.tail) {
        val ln = sdiv(2 * x + 8 * (l + b), 10)
        val bn = sdiv((ln - l) + 9 * b, 10)
        l = ln; b = bn
      }
      et -> ((xs.length.toLong, l, b))
    }
    val got = run("q284_holt_smoothing").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (et, (n, l, b)) =>
      val (en, el, eb) = expect(et)
      assert(n == en && l == el && b == eb,
        s"$et: engine ($n,$l,$b) != replay ($en,$el,$eb)")
    }
    // forecast column is the sum of the two state columns
    run("q284_holt_smoothing").collect().foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3))
    }
  }

  test("q285 seasonal strength: bounded, residual never exceeds total") {
    val rows = run("q285_seasonal_strength").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, res, st) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(res >= 0 && tot >= 0)
      assert(res <= tot, "within-weekday SS cannot exceed total SS (ANOVA identity)")
      assert(st >= 0 && st <= 1000000)
    }
  }

  test("q286 anomaly episodes: disjoint per type, spans consistent") {
    val rows = run("q286_anomaly_episodes").collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDate(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, eps) =>
      val sorted = eps.sortBy(_._2.toString)
      sorted.foreach { case (_, s, e, n, peak) =>
        assert(!e.before(s))
        // span length equals day count (episodes are CONSECUTIVE days)
        val span = (e.toLocalDate.toEpochDay - s.toLocalDate.toEpochDay) + 1
        assert(span == n, s"episode span $span != day count $n")
        assert(peak > 40000, "peak z²_e4 must exceed the 2σ entry threshold")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) =>
          assert(e1.before(s2), "episodes must be disjoint and separated")
        case _ => ()
      }
    }
  }
}
