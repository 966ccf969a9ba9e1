package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the storage-integrity wave (q502-q503):
  * counting-Bloom laws and the ARIES equivalence, replayed.
  */
class RecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q502 counting Bloom: replayed, no false negatives, conserved") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val m = 65536
    val cnt = new Array[Long](m)
    val deleted = ks.map(k => (k, math.floorMod(md5_60(s"del:$k"), 2L) == 0L))
      .toMap
    def positions(k: Long): Seq[Int] = (1 to 3).map(i =>
      math.floorMod(md5_60(s"cb$i:$k"), m.toLong).toInt)
    ks.foreach(k => positions(k).foreach(p => cnt(p) += 1L))
    ks.filter(deleted).foreach(k => positions(k).foreach(p => cnt(p) -= 1L))
    def found(k: Long): Boolean = positions(k).forall(p => cnt(p) >= 1L)
    val surv = ks.filterNot(deleted)
    assert(surv.forall(found), "no false negatives in the replay")
    val fp = ks.map(_ + 10000000L).count(found).toLong
    val ghosts = ks.filter(deleted).count(found).toLong
    val Array(r) = run("q502_counting_bloom").collect()
    assert(r.getLong(0) == surv.length.toLong && r.getLong(2) == 1L)
    assert(r.getLong(4) == ghosts, "ghost count bit-equal")
    assert(r.getLong(7) == fp, "false-positive count bit-equal")
    assert(r.getLong(11) == 1L && r.getLong(12) == 1L,
      "no underflow, conservation")
    assert(cnt.sum == 3L * surv.length, "conservation in the replay too")
  }

  test("q503 ARIES: zero equivalence violations, losers accounted") {
    val Array(r) = run("q503_aries_equivalence").collect()
    assert(r.getLong(0) > 100L, "parts present")
    assert(r.getLong(1) > r.getLong(0), "more records than parts")
    assert(r.getLong(3) == 0L,
      "redo-all-then-undo-losers == replay-committed on every part")
    assert(r.getLong(2) >= 0L && r.getLong(2) < r.getLong(0),
      "some parts survive with committed writes")
  }
}
