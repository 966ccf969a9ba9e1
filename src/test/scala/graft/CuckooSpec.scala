package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the cuckoo wave (q498): the eviction state
  * machine replayed in the driver.
  */
class CuckooSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q498 cuckoo: insertion machine replayed, both guarantees hold") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val byShard = ks.groupBy(k => math.floorMod(md5_60(s"cs:$k"), 32L))
      .map { case (sh, xs) =>
        (sh, xs.map(k => (md5_60(s"co:$k"), k)).sorted.take(36).map(_._2))
      }
    var (nItems, nFound, nStash, occTot, consViol) = (0L, 0L, 0L, 0L, 0L)
    byShard.foreach { case (_, items) =>
      val t1 = Array.fill(32)(-1L); val t2 = Array.fill(32)(-1L)
      val stash = scala.collection.mutable.ArrayBuffer[Long]()
      items.foreach { k =>
        var cur = k; var side = 1
        var kick = 0
        while (kick < 16 && cur != -1L) {
          if (side == 1) {
            val p = math.floorMod(md5_60(s"k1:$cur"), 32L).toInt
            val old = t1(p); t1(p) = cur; cur = old; side = 2
          } else {
            val p = math.floorMod(md5_60(s"k2:$cur"), 32L).toInt
            val old = t2(p); t2(p) = cur; cur = old; side = 1
          }
          kick += 1
        }
        if (cur != -1L) stash += cur
      }
      val occ = t1.count(_ != -1L) + t2.count(_ != -1L)
      if (occ + stash.length != items.length) consViol += 1
      items.foreach { k =>
        val f = t1(math.floorMod(md5_60(s"k1:$k"), 32L).toInt) == k ||
          t2(math.floorMod(md5_60(s"k2:$k"), 32L).toInt) == k ||
          stash.contains(k)
        if (f) nFound += 1
      }
      nItems += items.length; nStash += stash.length; occTot += occ
    }
    val Array(r) = run("q498_cuckoo").collect()
    assert(r.getLong(1) == nItems && r.getLong(2) == nFound,
      "items/found bit-equal to the replay")
    assert(nFound == nItems, "every key findable in the replay too")
    assert(r.getLong(3) == 1L, "O(1)-lookup certificate")
    assert(r.getLong(4) == nStash, "stash bit-equal")
    assert(r.getLong(6) == 0L && consViol == 0L, "conservation")
    assert(r.getLong(7) == occTot, "occupancy bit-equal")
  }
}
