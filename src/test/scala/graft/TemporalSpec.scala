package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the temporal surface (TemporalQueries,
  * q210-q214): frame boundaries behave per SQL fine print, the range
  * layout is disjoint and complete, the deletion ledger balances,
  * interpolation is bounded by its endpoints, and the clean funnel
  * partitions every purchase.
  */
class TemporalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q210 window frames: LAST_VALUE is the current row; FIRST is the 7-day-back edge") {
    val rows = run("q210_window_frames").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, g) =>
      val m = g.map(x => (x._2, x._3)).toMap
      g.foreach { case (_, day, v6, first, lastV) =>
        assert(lastV == v6, "RANGE frame ends at CURRENT ROW")
        val windowDays = (0L to 6L).map(day.minusDays).filter(m.contains).sorted
        assert(first == m(windowDays.head), "first = earliest day inside the frame")
      }
    }
  }

  test("q211 range layout: disjoint, complete, 8 files") {
    val r = run("q211_range_layout").collect()(0)
    assert(r.getAs[Long]("n_files") == 8L)
    assert(r.getAs[Long]("n_overlaps") == 0L, "file key spans pairwise disjoint")
    assert(r.getAs[Long]("n_rows") == Tables.events(spark, sf).count())
  }

  test("q212 deletion cascade: ledger balances; doomed users fully scrubbed") {
    val rows = run("q212_deletion_cascade").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byType = Tables.events(spark, sf)
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { case (t, kept, removed, _) =>
      assert(kept + removed == byType(t), s"$t row balance")
    }
    val doomedRows = Tables.events(spark, sf)
      .filter(col("user_id") % 101 === 0).count()
    assert(rows.map(_._3).sum == doomedRows, "every doomed row accounted")
  }

  test("q213 interpolation: observed rows pass through; gaps bounded by endpoints") {
    val rows = run("q213_linear_interpolate").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1.toEpochDay)
    assert(rows.exists(_._3), "thinning created at least one interpolated day")
    val observed = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 1000000) as bigint)")).as("v6"))
      .filter(dayofmonth(col("day")) % 3 =!= 0)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    rows.filter(!_._3).foreach { case (d, v, _) =>
      assert(observed(d) == v, s"$d observed value unchanged")
    }
    rows.filter(_._3).foreach { case (d, v, _) =>
      val prev = observed.keys.filter(_.isBefore(d)).maxBy(_.toEpochDay)
      val next = observed.keys.filter(_.isAfter(d)).minBy(_.toEpochDay)
      val (lo, hi) = (math.min(observed(prev), observed(next)),
        math.max(observed(prev), observed(next)))
      assert(v >= lo - 1 && v <= hi + 1, s"$d interpolation inside endpoint range")
    }
  }

  test("q214 clean funnel: partitions every purchase; recounts driver-side") {
    val r = run("q214_clean_funnel").collect()(0)
    val (clean, poisoned, cold, total) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(clean + poisoned + cold == total)
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._4, e._2)))
    var (c, p, k) = (0L, 0L, 0L)
    seqs.foreach { case (_, es) =>
      var lastClick = Option.empty[Long]
      var lastError = Option.empty[Long]
      es.foreach { e =>
        if (e._3 == "purchase") {
          (lastClick, lastError) match {
            case (None, _) => k += 1
            case (Some(lc), Some(le)) if le >= lc => p += 1
            case _ => c += 1
          }
        }
        if (e._3 == "click") lastClick = Some(e._4)
        if (e._3 == "error") lastError = Some(e._4)
      }
    }
    assert(clean == c && poisoned == p && cold == k)
  }
}
