package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sequential-decision wave (q474-q476):
  * full driver replays of the Smith-Waterman DP, the two-choice
  * placement fold, and the secretary stopping rule.
  */
class SequentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q474 SW: full local-alignment DP replayed in the driver") {
    val pat = Seq("signup", "view", "click", "view", "click", "purchase")
    val m = pat.length
    def sw(ets: Seq[String]): Long = {
      var row = Array.fill(m + 1)(0L)
      var best = 0L
      ets.foreach { et =>
        val nr = new Array[Long](m + 1)
        var j = 1
        while (j <= m) {
          nr(j) = math.max(0L, math.max(math.max(row(j) - 1L, nr(j - 1) - 1L),
            row(j - 1) + (if (et == pat(j - 1)) 2L else -1L)))
          if (nr(j) > best) best = nr(j)
          j += 1
        }
        row = nr
      }
      best
    }
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    val hist = ev.groupBy(_._1).map { case (_, xs) =>
      sw(xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).toSeq)
    }.groupBy(identity).map { case (b, g) => (b, g.size.toLong) }
    val rows = run("q474_sw_alignment").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toMap == hist,
      "score histogram bit-equal")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 2L * 6L, "0 <= best <= 2m")
      assert(r.getLong(3) == 0L, "no out-of-bounds scores")
    }
  }

  test("q475 two choices: fold replayed, collapse observed") {
    val rows = run("q475_two_choice").collect()
    assert(rows.length == 2)
    val one = rows.find(_.getString(0) == "1_one_choice").get
    val two = rows.find(_.getString(0) == "2_two_choice").get
    assert(one.getLong(1) == two.getLong(1), "same items both schemes")
    assert(one.getLong(5) == 1L && two.getLong(5) == 1L, "loads conserved")
    assert(two.getLong(2) <= one.getLong(2),
      "two-choice max load never worse")
    assert(two.getLong(4) <= one.getLong(4), "two-choice spread never worse")
    // driver replay of the greedy fold
    import org.apache.spark.sql.functions._
    val ks = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val loads = scala.collection.mutable.Map[(Long, Int), Long]()
      .withDefaultValue(0L)
    ks.map(k => (math.floorMod(md5_60(s"shard:$k"), 512L),
        md5_60(s"ord:$k"), k,
        math.floorMod(md5_60(s"c1:$k"), 32L).toInt,
        math.floorMod(md5_60(s"c2:$k"), 32L).toInt))
      .groupBy(_._1).foreach { case (shard, xs) =>
        xs.sortBy(t => (t._2, t._3)).foreach { case (_, _, _, h1, h2) =>
          val c = if (loads((shard, h2)) < loads((shard, h1))) h2 else h1
          loads((shard, c)) += 1L
        }
      }
    val allLoads = (0L until 512L).flatMap(s => (0 until 32).map(b =>
      loads((s, b))))
    assert(two.getLong(2) == allLoads.max, "max load bit-equal to replay")
    assert(two.getLong(3) == allLoads.min, "min load bit-equal to replay")
  }

  test("q476 secretary: rule replayed, n=1 always succeeds") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), (r.getDate(2).toString, r.getLong(1), r.getLong(3))))
    val byN = o.groupBy(_._1).toSeq.map { case (_, xs) =>
      val vs = xs.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._3)
      val n = vs.length
      val r = n.toLong * 367879L / 1000000L
      val rejmax = if (r == 0L) -1L else vs.take(r.toInt).max
      val picked = vs.drop(r.toInt).find(_ > rejmax).getOrElse(vs.last)
      (n.toLong, if (picked == vs.max) 1L else 0L)
    }.groupBy(_._1).map { case (n, g) =>
      (n, (g.size.toLong, g.map(_._2).sum))
    }
    val rows = run("q476_secretary").collect()
    assert(rows.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      == byN, "per-n success counts bit-equal to replay")
    rows.filter(_.getLong(0) == 1L)
      .foreach(r => assert(r.getLong(3) == 10000L, "n=1 always succeeds"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(5) == 1L, "r depends only on n")
    }
  }
}
