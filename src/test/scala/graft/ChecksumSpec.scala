package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the checksum wave (q506): mod-97 closes
  * Luhn's blind spot, on the identical attack.
  */
class ChecksumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q506 mod-97: replayed, every guarantee total, blind spot closed") {
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    var (caught1, caught2, noop, blind, blindCaught) = (0L, 0L, 0L, 0L, 0L)
    ks.foreach { k =>
      val pay = f"$k%09d"
      val cc = ((98L - pay.toLong * 100L % 97L) % 97L)
      val prot = pay + f"$cc%02d"
      assert(prot.toLong % 97L == 1L, "protected number validates")
      val h = md5_60(k.toString)
      val p1 = (math.floorMod(h, 9L) + 1).toInt
      val att1 = prot.updated(p1 - 1,
        (((prot(p1 - 1) - '0' + 1) % 10) + '0').toChar)
      if (att1.toLong % 97L != 1L) caught1 += 1
      val p2 = (math.floorMod(h / 16, 8L) + 1).toInt
      val att2 = (prot.substring(0, p2 - 1) + prot(p2) + prot(p2 - 1)
        + prot.substring(p2 + 1))
      val isNoop = prot(p2 - 1) == prot(p2)
      val isBlind = prot.substring(p2 - 1, p2 + 1) == "09" ||
        prot.substring(p2 - 1, p2 + 1) == "90"
      if (att2.toLong % 97L != 1L) {
        caught2 += 1
        if (isBlind) blindCaught += 1
      }
      if (isNoop) noop += 1
      if (isBlind) blind += 1
    }
    val Array(r) = run("q506_mod97_audit").collect()
    assert(r.getLong(0) == ks.length.toLong && r.getLong(2) == 1L)
    assert(r.getLong(3) == caught1 && r.getLong(4) == 1L,
      "every digit bump caught")
    assert(r.getLong(5) == caught2 && r.getLong(7) == 1L,
      "every non-noop transposition caught")
    assert(r.getLong(6) == noop && r.getLong(8) == blind)
    assert(r.getLong(9) == blindCaught && r.getLong(10) == 1L,
      "the Luhn-blind 09/90 swaps all caught here")
    // identical attack as q467: noop and blind tallies must agree
    val Array(l) = run("q467_luhn_audit").collect()
    assert(l.getLong(6) == r.getLong(6), "same no-op swap count as q467")
    assert(l.getLong(7) == r.getLong(8), "same 09/90 count as q467")
  }
}
