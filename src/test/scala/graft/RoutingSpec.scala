package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the scheduling-and-routing wave
  * (q494-q495): SJF costs and Chord routing replayed in the driver.
  */
class RoutingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q494 SJF: per-day costs replayed, exchange theorem holds") {
    import org.apache.spark.sql.functions._
    val jobs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(expr("cast(o_orderdate as date)").as("d"), col("o_orderkey"))
      .agg(count(lit(1)).as("sz")).collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2))))
    def cost(ss: Seq[Long]): Long =
      ss.zipWithIndex.map { case (v, i) => (ss.length - i).toLong * v }.sum
    var (sjfT, fifoT, ljfT, viol) = (0L, 0L, 0L, 0L)
    jobs.groupBy(_._1).foreach { case (_, xs) =>
      val byK = xs.map(_._2).sortBy(_._1).map(_._2).toSeq
      val (cs, cf, cl) = (cost(byK.sorted), cost(byK), cost(byK.sorted.reverse))
      if (!(cs <= cf && cf <= cl)) viol += 1
      sjfT += cs; fifoT += cf; ljfT += cl
    }
    val Array(r) = run("q494_sjf_census").collect()
    assert(r.getLong(2) == sjfT, "SJF total bit-equal")
    assert(r.getLong(3) == fifoT, "FIFO total bit-equal")
    assert(r.getLong(4) == ljfT, "LJF total bit-equal")
    assert(r.getLong(6) == 0L && viol == 0L, "exchange argument holds")
  }

  test("q495 Chord: routing replayed, lemma and ownership certified") {
    val M = 1L << 60
    val nodes = (0 until 32).map(i => math.floorMod(md5_60(s"node:$i"), M))
      .sorted
    def succ(x: Long): Long = nodes.find(_ > x).getOrElse(nodes.head)
    def dist(a: Long, b: Long): Long = math.floorMod(b - a, M)
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
      .filter(k => math.floorMod(md5_60(s"pick:$k"), 117L) == 0L)
    val hist = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    ks.foreach { k =>
      val kid = math.floorMod(md5_60(s"kid:$k"), M)
      val owner = succ(kid)
      var cur = nodes(math.floorMod(md5_60(s"start:$k"), 32L).toInt.min(31))
      var hops = 0L
      var done = false
      (1 to 12).foreach { _ =>
        if (!done) {
          if (dist(cur, kid) <= dist(cur, succ(cur))) {
            cur = succ(cur); hops += 1; done = true
          } else {
            val cands = (0 to 59).map(j =>
              succ(math.floorMod(cur + (1L << j), M)))
              .filter(c => dist(cur, c) <= dist(cur, kid) && c != cur)
            val nx = cands.maxBy(c => (dist(cur, c), c))
            assert(dist(nx, kid) < dist(cur, kid),
              "monotone progress: distance strictly shrinks")
            cur = nx; hops += 1
          }
        }
      }
      assert(done && cur == owner, s"key $k resolves to its owner")
      hist(hops) += 1L
    }
    val rows = run("q495_chord_routing").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toMap == hist.toMap,
      "hop histogram bit-equal")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), "all keys resolved to owner")
      assert(r.getLong(3) == 0L, "zero progress violations")
      assert(r.getLong(4) <= r.getLong(0) * r.getLong(1),
        "halved hops bounded by total hops")
      assert(r.getLong(0) <= 12L)
    }
  }
}
