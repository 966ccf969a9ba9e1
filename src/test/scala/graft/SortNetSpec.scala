package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sorting-network wave (q507): the
  * network replayed in the driver, exhaustively and on real tuples.
  */
class SortNetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private val gates = Seq((1, 2), (3, 4), (5, 6), (7, 8), (1, 3), (2, 4),
    (5, 7), (6, 8), (2, 3), (6, 7), (1, 5), (2, 6), (3, 7), (4, 8),
    (3, 5), (4, 6), (2, 3), (4, 5), (6, 7))

  private def net(in: Seq[Long]): Seq[Long] = {
    val a = in.toArray
    gates.foreach { case (l, h) =>
      if (a(l - 1) > a(h - 1)) { val t = a(l - 1); a(l - 1) = a(h - 1); a(h - 1) = t }
    }
    a.toSeq
  }

  test("q507 network: 0-1 principle exhaustive, real tuples preserved") {
    // driver-side exhaustive check of the same 19 gates
    (0 until 256).foreach { v =>
      val in = (0 to 7).map(j => ((v >> j) & 1).toLong)
      val out = net(in)
      assert(out == out.sorted, s"binary input $v sorts")
    }
    val Array(r) = run("q507_sorting_network").collect()
    assert(r.getLong(0) == 19L)
    assert(r.getLong(1) == 256L && r.getLong(2) == 256L)
    assert(r.getLong(3) == 1L, "0-1 principle certificate")
    assert(r.getLong(4) == r.getLong(5), "every real tuple sorted")
    assert(r.getLong(4) == r.getLong(6), "every real tuple a permutation")
    assert(r.getLong(7) == 1L)
  }
}
