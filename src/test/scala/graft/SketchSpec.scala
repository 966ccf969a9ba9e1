package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sketch/estimator wave (q421-q424): the
  * MG deficit guarantee, the HLL error band, Croston state replay,
  * and CvM bounds.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q421 Misra-Gries: both sides of the deficit guarantee hold") {
    val Array(r) = run("q421_misra_gries").collect()
    assert(r.getLong(5) == 0L, "an MG estimate never exceeds the truth")
    assert(r.getLong(6) == 0L, "truth - est <= deficit bound, always")
    assert(r.getLong(7) == 0L, "no heavy item (tru > B) goes untracked")
    assert(r.getLong(3) <= r.getLong(4), "tracked is a subset of items")
    assert(r.getLong(9) > 0, "top estimate is positive")
    // driver replay of one shard's fold
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        expr("pmod(md5_60(cast(event_id as string)), 16)"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val shard0 = ev.filter(_._4 == 0L).sortBy(x => (x._2, x._3))
    var st = Vector.empty[(Long, Long)]
    shard0.foreach { case (it, _, _, _) =>
      if (st.exists(_._1 == it))
        st = st.map { case (i, c) => if (i == it) (i, c + 1) else (i, c) }
      else if (st.size < 8) st = st :+ (it, 1L)
      else st = st.map { case (i, c) => (i, c - 1) }.filter(_._2 > 0)
    }
    // replayed counters obey the per-shard guarantee
    val truth0 = shard0.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    st.foreach { case (it, c) =>
      assert(c <= truth0(it) && truth0(it) - c <= shard0.length / 9)
    }
  }

  test("q422 HLL: estimate lands inside the 3-sigma band") {
    val Array(r) = run("q422_hll_scratch").collect()
    val (exact, est, err) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(exact > 640, "n >> 2.5m so the uncorrected regime applies")
    assert(math.abs(err) <= 1950, s"|err| within 3*1.04/sqrt(256): $err")
    assert(err == (est - exact) * 10000 / exact)
    assert(r.getLong(3) < 256, "some buckets are hit")
  }

  test("q423 Croston: fold state replayed in the driver for one part") {
    val rows = run("q423_croston_sba").collect()
    val Array(r) = rows
    assert(r.getLong(0) > 0, "parts survive the >=3-demand filter")
    assert(r.getLong(3) + r.getLong(4) <= r.getLong(0))
    assert(r.getLong(5) > 0, "error ratio is positive")
    // replay: pick the part with the most train demand days
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("d"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .groupBy("l_partkey", "d").agg(sum("q").as("q"))
      .collect().map(x => (x.getLong(0), x.getDate(1).toLocalDate, x.getLong(2)))
    val d0 = li.map(_._2).min
    val sp = java.time.temporal.ChronoUnit.DAYS.between(d0, li.map(_._2).max)
    val cut = sp * 8 / 10
    val byP = li.map { case (p, d, q) =>
      (p, java.time.temporal.ChronoUnit.DAYS.between(d0, d), q)
    }.filter(_._2 < cut).groupBy(_._1).filter(_._2.length >= 3)
    assert(byP.nonEmpty)
    val (_, seq) = byP.maxBy(_._2.length)
    var z = 0L; var v = -1L; var last = -1L; var seen = 0L
    seq.sortBy(_._2).foreach { case (_, i, q) =>
      z = if (seen == 0) q * 1000 else z + (q * 1000 - z) / 8
      v = if (seen == 0) -1L
          else if (seen == 1) (i - last) * 1000
          else v + ((i - last) * 1000 - v) / 8
      last = i; seen += 1
    }
    assert(z > 0 && v >= 1000, "replayed states are well-formed")
  }

  test("q424 CvM: statistic bounds and rank identity") {
    val Array(r) = run("q424_cvm_drift").collect()
    val (n, m, sa2, sb2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && m > 0)
    assert(sa2 <= n * m * m && sb2 <= m * n * n, "belows bounded by sizes")
    // T in [-1/6, ...] — scaled: t_e6 >= -166667
    assert(r.getLong(4) >= -166667L)
    assert(r.getLong(5) == (if (r.getLong(4) > 461000L) 1L else 0L))
  }
}
