package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the robustness surface (RobustQueries,
  * q190-q194): the salted join equals the plain join, CSV corruption
  * accounting balances, PQ assigns every block exactly once with
  * self-assigned seeds, the coverage curve is monotone, and pattern
  * matches recount from a driver-side scan.
  */
class RobustSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q190 salted join: identical to the plain unsalted join") {
    val got = run("q190_salted_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val e = Tables.events(spark, sf)
      .select(col("event_type"), expr("cast(round(value * 1000000) as bigint)").as("v6"))
    val dim = e.groupBy("event_type")
      .agg(expr("sum(v6) div count(1)").as("mean_v6"))
    val plain = e.join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v6") > col("mean_v6"), 1L).otherwise(0L)).as("n_above_mean"),
        min("mean_v6").as("mean_v6"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == plain, "salting is invisible in the result")
  }

  test("q191 CSV accounting: balances against the orders table") {
    val rows = run("q191_csv_malformed").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byStatus = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L)).as("bad"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (st, good, corrupt, priced) =>
      val (n, bad) = byStatus(st)
      assert(good + corrupt == n, s"$st row balance")
      assert(corrupt == bad, s"$st corrupt count")
      assert(priced == good, s"$st every good row parsed a price")
    }
  }

  test("q192 PQ: every (vector, block) assigned once; seeds self-assign at zero error") {
    val rows = run("q192_product_quantization").collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1), r.getLong(2), r.getDecimal(3)))
    val nVecs = Tables.embeddings(spark, sf).count()
    (0L to 7L).foreach { b =>
      val g = rows.filter(_._1 == b)
      assert(g.map(_._3).sum == nVecs, s"block $b assignment census")
      assert(g.map(_._2).toSet.subsetOf((0 to 7).toSet))
      g.foreach { case (_, _, _, sse) => assert(sse.signum() >= 0) }
    }
  }

  test("q193 vocab coverage: monotone, bounded, recounts at the first cut") {
    val rows = run("q193_vocab_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 >= a._2 && b._5 >= a._5, "coverage monotone")
      case _ =>
    }
    rows.foreach { case (_, covered, total, _, cov) =>
      assert(covered <= total && cov <= 1000000L)
      assert(cov == covered * 1000000L / total)
    }
    // recount the V=5 cut directly
    val tf = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top5 = tf.sortBy { case (t, n) => (-n, t) }.take(5).map(_._2).sum
    assert(rows.head._1 == 5 && rows.head._2 == top5)
  }

  test("q194 event pattern: gap-1 matches recount from an ordered driver-side scan") {
    val rows = run("q194_event_pattern").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._4, e._2)).map(_._3).toIndexedSeq)
    var m1 = 0L
    var users1 = Set.empty[Long]
    seqs.foreach { case (u, ts) =>
      ts.sliding(2).foreach { w =>
        if (w.length == 2 && w(0) == "click" && w(1) == "error") {
          m1 += 1; users1 += u
        }
      }
    }
    assert(rows.head._2 == m1 && rows.head._3 == users1.size.toLong)
  }
}
