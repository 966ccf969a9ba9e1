package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the erasure wave (q522): decodability and
  * recovery replayed in the driver over GF(2).
  */
class ErasureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q522 erasure code: census and recovery replayed") {
    val masks = Seq(1, 2, 4, 8, 15, 6)
    val pairs = for { i <- 1 to 6; j <- i + 1 to 6 } yield (i, j)
    def span(kept: Seq[Int]): Set[Int] =
      (0 until 16).map { s =>
        (0 until 4).filter(t => ((s >> t) & 1) == 1)
          .foldLeft(0)((a, t) => a ^ kept(t))
      }.toSet
    val decodable = pairs.zipWithIndex.map { case ((i, j), ix) =>
      val kept = (1 to 6).filterNot(x => x == i || x == j)
        .map(x => masks(x - 1))
      (ix + 1, span(kept).size == 16)
    }.toMap
    assert(decodable.values.count(identity) == 11,
      "exactly 11 of 15 patterns decode")
    assert(!decodable(3) && !decodable(4) && !decodable(6) && !decodable(13),
      "the four failures are {C1,C4}, {C1,C5}, {C2,C3}, {C4,C5}")
    val Array(r) = run("q522_erasure_code").collect()
    assert(r.getLong(0) == 15L && r.getLong(1) == 11L)
    assert(r.getLong(2) == (3L ^ 4L ^ 6L ^ 13L), "failure-id fingerprint")
    assert(r.getLong(5) == r.getLong(4), "every decodable draw recovered B1")
    assert(r.getLong(6) == 1L, "recovery certificate")
  }
}
