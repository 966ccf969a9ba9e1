package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the maintenance surface (MaintQueries,
  * q200-q204): delta-merge is consistent on every key, Bellman-Ford
  * distances recompute driver-side, the hash census conserves the
  * vocabulary, dynamic overwrite shifts exactly the targeted
  * partitions, and the HLL estimates are exact in sparse range.
  */
class MaintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q200 incremental MV: every key consistent (merge == recompute)") {
    val rows = run("q200_incremental_mv").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("consistent")))
  }

  test("q201 Bellman-Ford: census matches a driver-side 3-round relaxation") {
    val r = run("q201_bellman_ford").collect()(0)
    val (n, sum, mx, minPos) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val pairs = FeatureQueries.dupPairsTable(spark, sf)
      .select("doc_a", "doc_b", "j_e6").collect()
      .map(p => (p.getLong(0), p.getLong(1), 1000000L - p.getLong(2)))
    val adj = (pairs.map(p => (p._1, (p._2, p._3))) ++ pairs.map(p => (p._2, (p._1, p._3))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = pairs.map(_._1).min
    var dist = Map(seed -> 0L)
    (1 to 3).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (u, d) =>
        adj.getOrElse(u, Array.empty[(Long, Long)]).map { case (v, w) => (v, d + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(n == dist.size.toLong)
    assert(sum == dist.values.sum)
    assert(mx == dist.values.max)
    assert(minPos == dist.values.filter(_ > 0).min)
  }

  test("q202 feature-hash census: conserves the gram vocabulary; <=1024 buckets") {
    val rows = run("q202_feature_hash_census").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val vocab = rows.head._3
    assert(rows.forall(_._3 == vocab))
    assert(rows.map { case (g, b, _) => g * b }.sum == vocab, "every gram in exactly one bucket")
    assert(rows.map(_._2).sum <= 1024L)
    val nGrams = TextQueries.gramTable(spark, sf)
      .select(explode(col("g")).as("gram")).distinct().count()
    assert(vocab == nGrams)
  }

  test("q203 dynamic overwrite: exactly the last 5 days shifted by +1 per row") {
    val rows = run("q203_dynamic_overwrite").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val direct = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 1000000) as bigint)")).as("s"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    val cut = direct.map(_._1).max.minusDays(4)
    assert(rows.length == direct.length, "no partition lost or duplicated")
    val dm = direct.map(d => (d._1, (d._2, d._3))).toMap
    rows.foreach { case (day, n, s) =>
      val (dn, ds) = dm(day)
      assert(n == dn, s"$day row count intact")
      if (day.isBefore(cut)) assert(s == ds, s"$day untouched partition byte-identical")
      else assert(s == ds + dn, s"$day corrected partition shifted +1/row")
    }
  }

  test("q204 KMV set ops: exact below k, estimates recompute from the hash order") {
    val r = run("q204_kmv_setops").collect()(0)
    val e = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "user_id").distinct()
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val users = e.map(_._2).distinct
    // 150 users at this SF < k = 256: every sketch holds its whole set
    assert(users.length < 256)
    val clicks = e.filter(_._1 == "click").map(_._2).distinct.length.toLong
    val purchases = e.filter(_._1 == "purchase").map(_._2).distinct.length.toLong
    assert(r.getAs[Long]("est_click") == clicks)
    assert(r.getAs[Long]("est_purchase") == purchases)
    assert(r.getAs[Long]("est_union") == users.length.toLong)
    assert(r.getAs[Long]("est_inter") == r.getAs[Long]("exact_inter"))
    assert(r.getAs[Long]("inter_err") == 0L)
  }
}
