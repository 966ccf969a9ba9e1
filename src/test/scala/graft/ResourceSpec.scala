package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the resource-allocation wave (q477-q479):
  * a full driver replay of the UCB1 fold, the Hamming/SECDED
  * certificates, and the merge-pass closed form.
  */
class ResourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q477 UCB1: 256-step fold replayed in the driver, bit-equal") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .filter(expr("source in ('src0','src1','src2','src3','src4')"))
      .select(col("source"), col("doc_id"),
        expr("case when lang = 'en' then 1L else 0L end"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rw = (0 until 5).map { i =>
      docs.filter(_._1 == s"src$i")
        .map(t => (md5_60(s"pull:${t._2}"), t._2, t._3))
        .sortBy(t => (t._1, t._2)).take(256).map(_._3)
    }
    def flog2(t: Int): Long = (31 - Integer.numberOfLeadingZeros(t)).toLong
    val n = Array.fill(5)(0L); val sm = Array.fill(5)(0L)
    for (t <- 1 to 256) {
      val ch =
        if (t <= 5) t - 1
        else {
          val idx = (0 until 5).map(a => sm(a) * 1000000L / n(a) +
            math.floor(math.sqrt((2L * flog2(t) * 1000000000000L / n(a))
              .toDouble)).toLong)
          idx.indexOf(idx.max)
        }
      sm(ch) += rw(ch)(((n(ch) % rw(ch).length)).toInt)
      n(ch) += 1L
    }
    val rows = run("q477_ucb_bandit").collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"src$i")
      assert(r.getLong(2) == n(i), s"pulls arm $i bit-equal")
      assert(r.getLong(3) == sm(i), s"wins arm $i bit-equal")
      assert(r.getLong(6) == 1L, "total pulls certificate")
    }
    assert(n.sum == 256L)
    // the best-true-yield arm got the most pulls at this horizon
    val best = rows.maxBy(_.getLong(5))
    assert(best.getLong(2) == rows.map(_.getLong(2)).max,
      "UCB1 concentrated on the best arm")
  }

  test("q478 Hamming: every certificate at 100%") {
    val Array(r) = run("q478_hamming_secded").collect()
    val nk = r.getLong(0)
    assert(nk > 100L)
    (1 to 7).foreach(i => assert(r.getLong(i) == nk,
      s"certificate column $i == n_keys"))
  }

  test("q479 sort economics: closed form and monotonicity") {
    val rows = run("q479_sort_economics").collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val (fanin, runs0, passes) = (r.getLong(1), r.getLong(3), r.getLong(4))
      // passes is the least p with fanin^p >= runs0
      def pow(b: Long, e: Long): Long =
        (1L to e).foldLeft(1L)((acc, _) => acc * b)
      if (runs0 > 1L) {
        assert(pow(fanin, passes) >= runs0, "enough merge capacity")
        assert(passes == 1L || pow(fanin, passes - 1L) < runs0,
          "no wasted pass")
      } else assert(passes == 0L)
      assert(r.getLong(7) == 1L, "single-merge certificate")
      assert(r.getLong(5) == 2L * r.getLong(2) * (1L + passes), "io formula")
    }
    // more fan-in never costs more passes at the same scale
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      g.sortBy(_.getLong(1)).map(_.getLong(4)).sliding(2).foreach {
        case Array(a, b) => assert(b <= a, "passes monotone in fan-in")
        case _           =>
      }
    }
  }
}
