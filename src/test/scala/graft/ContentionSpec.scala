package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the contention wave (q504-q505): ALOHA
  * census and the backoff machine replayed in the driver.
  */
class ContentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def keys(): Array[Long] = {
    import org.apache.spark.sql.functions._
    Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
  }

  test("q504 slotted ALOHA: census replayed, theory exact") {
    val ks = keys()
    val rows = run("q504_slotted_aloha").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L, 16L, 32L))
    rows.foreach { r =>
      val k = r.getLong(0)
      val gMod = math.max(ks.length / 8, 1).toLong
      val groups = ks.groupBy(x => math.floorMod(md5_60(s"grp:$x"), gMod))
        .values.filter(_.length == 8)
      val succ = groups.count(g =>
        g.count(x => math.floorMod(md5_60(s"tx:$k:$x"), k) == 0L) == 1).toLong
      assert(r.getLong(1) == groups.size.toLong, s"k=$k group count")
      assert(r.getLong(3) == succ, s"k=$k success count bit-equal")
      def p(b: Long, e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * b)
      assert(r.getLong(7) == 8L * p(k - 1, 7) * 10000L / p(k, 8),
        "binomial theory")
      assert(r.getLong(9) == 1L, "success/idle/collision partition")
    }
  }

  test("q505 exponential backoff: machine replayed bit-equal") {
    val ks = keys()
    val byGrp = ks.map(k => (math.floorMod(md5_60(s"bg:$k"), 64L), k))
      .groupBy(_._1).map { case (g, xs) =>
        (g, xs.map(t => (md5_60(s"br:${t._2}"), t._2)).sorted.take(16)
          .map(_._2))
      }.filter(_._2.length == 16)
    var (delivered, drained, collTot, drainSum) = (0L, 0L, 0L, 0L)
    byGrp.foreach { case (_, st) =>
      val n = st.length
      val w = Array.fill(n)(2L)
      val done = Array.fill(n)(false)
      var (dr, coll) = (0L, 0L)
      for (round <- 1 to 20) {
        val slots = (0 until n).map(p =>
          if (done(p)) -1L
          else math.floorMod(md5_60(s"bo:$round:${st(p)}"), w(p)))
        val collide = (0 until n).filter(p => slots(p) >= 0L &&
          slots.count(_ == slots(p)) > 1)
        coll += collide.length
        (0 until n).foreach { p =>
          if (!done(p) && slots(p) >= 0L && slots.count(_ == slots(p)) == 1)
            done(p) = true
        }
        collide.foreach(p => w(p) = math.min(w(p) * 2, 64L))
        if (dr == 0L && done.forall(identity)) dr = round.toLong
      }
      delivered += done.count(identity).toLong
      if (done.forall(identity)) drained += 1L
      collTot += coll; drainSum += dr
    }
    val Array(r) = run("q505_exp_backoff").collect()
    assert(r.getLong(0) == byGrp.size.toLong)
    assert(r.getLong(1) == drained, "fully-drained groups bit-equal")
    assert(r.getLong(2) == delivered, "delivered bit-equal")
    assert(r.getLong(4) == drainSum, "drain rounds bit-equal")
    assert(r.getLong(6) == collTot, "collision events bit-equal")
    assert(r.getLong(8) == 0L, "window cap certified")
  }
}
