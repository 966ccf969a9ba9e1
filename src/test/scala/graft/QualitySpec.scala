package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the quality surface (QualityQueries,
  * q231-q235): diversity counts bound group sizes, outliers really
  * exceed their weekday 3σ, linkage weights conserve pair mass, FD
  * confidence is exact on a synthetic functional column, and the
  * confusion matrix covers every vector exactly once.
  */
class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q231 l-diversity: 1 <= l <= min(|statuses|, group size); totals conserve") {
    val rows = run("q231_l_diversity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == Tables.orders(spark, sf).count())
    rows.foreach { case (_, _, n, l, viol) =>
      assert(l >= 1 && l <= math.min(3L, n), "sensitive domain has 3 statuses")
      assert(viol == (l < 2))
    }
  }

  test("q232 seasonal outliers: every flagged day exceeds its weekday 3-sigma") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("v_c"))
      .withColumn("wd", expr("datediff(day, date '1970-01-01') % 7"))
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getInt(2)))
    val byWd = daily.groupBy(_._3)
    val flagged = run("q232_seasonal_outliers").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    flagged.foreach { case (day, wd, vc, dev) =>
      val grp = byWd(wd.toInt)
      val nW = grp.length.toLong; val sW = grp.map(_._2).sum
      assert(dev == vc * nW - sW, s"$day dev recomputes")
      val sumDev2 = grp.map(g => { val d = BigInt(g._2) * nW - sW; d * d }).sum
      assert(BigInt(dev) * dev * nW > 9 * sumDev2, s"$day beyond 3 sigma")
    }
    // and no non-flagged day exceeds it
    val flaggedSet = flagged.map(_._1.toString).toSet
    daily.foreach { case (day, vc, wd) =>
      if (!flaggedSet.contains(day.toString)) {
        val grp = byWd(wd)
        val nW = grp.length.toLong; val sW = grp.map(_._2).sum
        val d = BigInt(vc) * nW - sW
        val sumDev2 = grp.map(g => { val x = BigInt(g._2) * nW - sW; x * x }).sum
        assert(d * d * nW <= 9 * sumDev2, s"$day wrongly unflagged")
      }
    }
  }

  test("q233 linkage weights: pattern ledger conserves candidates; m/u sane") {
    val rows = run("q233_linkage_weights").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val nCand = {
      val d = Tables.documents(spark, sf)
        .select(col("doc_id"), expr("n_chars div 20").as("lb"))
      d.as("a").join(d.as("b"),
        col("a.lb") === col("b.lb") && col("a.doc_id") < col("b.doc_id")).count()
    }
    assert(rows.map(r => r._3 + r._4).sum == nCand, "every candidate in one pattern")
    rows.foreach { case (_, _, _, _, m6, u6, w6) =>
      assert(m6 >= 0 && m6 <= 1000000 && u6 >= 0 && u6 <= 1000000)
      assert(w6 == m6 * 1000000L / math.max(u6, 1L))
    }
  }

  test("q234 FD confidence: synthetic exact FD scores 10000") {
    import spark.implicits._
    // a held FD must score exactly 1.0 — recompute with the same shape
    val rows = run("q234_fd_confidence").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("custkey->priority", "priority->status", "orderkey->returnflag"))
    rows.values.foreach { case (n, g, conf) =>
      assert(g <= n && conf >= 10000L / 3 && conf <= 10000L, "conf in (1/|dom|, 1]")
    }
    // independent exact check on a constructed functional pair
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("l", "r")
    val conf = df.groupBy("l", "r").agg(count(lit(1)).as("n"))
      .groupBy("l").agg(sum("n").as("gn"), max("n").as("gmax"))
      .agg(expr("sum(gmax) * 10000 div sum(gn)")).collect()(0).getLong(0)
    assert(conf == 10000L, "functional pair scores exactly 1.0")
  }

  test("q235 centroid classify: every vector classified once; diagonal dominant") {
    val rows = run("q235_centroid_classify").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == Tables.embeddings(spark, sf).count())
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    val total = rows.map(_._3).sum
    // 10 labels → random = 10%; centroids must beat 3× random on their
    // own training data (the synthetic embeddings are mostly noise, so
    // "majority correct" is not a given — signal-above-chance is)
    assert(diag * 10 >= 3 * total,
      s"accuracy ${diag}/$total beats 3x random chance")
  }
}
