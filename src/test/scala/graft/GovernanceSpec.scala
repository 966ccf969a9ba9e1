package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the governance/lifecycle surface
  * (GovernanceQueries, q118-q123): redaction actually fires, SCD2
  * intervals tile each user's timeline, merge conserves events,
  * winsorize bounds match a driver-side recomputation, and the SCD2
  * plan reuses one user_id exchange across its three window passes.
  */
class GovernanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("test")
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q118 PII scrub: digit runs fire on every props row, templates collapse") {
    val rows = run("q118_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hit, removed, templates) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hit == n, "every synthetic props payload contains digits")
      assert(removed > 0)
      assert(templates < n, "redaction must collapse distinct payloads into templates")
    }
  }

  test("q119 rarity: every doc scores >= 1e6 (inverse prob of the commonest token is >= 1)") {
    val rows = run("q119_rarity_score").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      // each term is (1e6 * N) div cnt >= 1e6 since cnt <= N; the mean
      // can floor below only if a doc had zero tokens (none do)
      assert(r.getLong(2) >= 1000000L, s"doc ${r.getLong(0)} rarity ${r.getLong(2)}")
    }
  }

  test("q120 SCD2: intervals tile each user's timeline; exactly one current row per user") {
    val rows = run("q120_scd2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq,
        s"user $u versions not contiguous")
      assert(sorted.count(_._6) == 1, s"user $u must have exactly one current row")
      assert(sorted.last._6 && sorted.last._4.isEmpty,
        s"user $u: only the last version is open-ended")
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._4.contains(b._3), s"user $u: valid_to must equal next valid_from")
        assert(a._2 != b._2, s"user $u: consecutive versions must change state")
      }
    }
  }

  test("q120 SCD2 plan: one user_id exchange shared by the change filter and both windows") {
    val plan = run("q120_scd2").queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected a single reused user_id shuffle, got $shuffles:\n$plan")
  }

  test("q121 merge conserves events and partitions users by action") {
    val rows = run("q121_merge_upsert").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "merged n_events must conserve the log")
    val actions = rows.map(_.getString(1)).toSet
    assert(actions.subsetOf(Set("insert", "update", "keep")))
    assert(actions.contains("update"), "the half-split fixture must produce updates")
  }

  test("q122 skew profile matches a driver-side recomputation") {
    val got = run("q122_skew_profile").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
    val n = ev.length.toLong
    def check(name: String, keys: Seq[Any]): Unit = {
      val counts = keys.groupBy(identity).map(_._2.length.toLong)
      assert(got(name) == ((n, counts.size.toLong, counts.max)), name)
    }
    check("user_id", ev.map(_.getLong(0)))
    check("event_type", ev.map(_.getString(1)))
    check("day", ev.map(_.getTimestamp(2).toLocalDateTime.toLocalDate))
  }

  test("q124 FK audit: clean star schema has zero orphans on every edge; one lineitem scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = run("q124_fk_audit")
    val rows = df.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)}: testdata must be referentially clean")
      assert(r.getLong(1) > 0L)
    }
    // the load-bearing shape: all three fact edges audit off ONE
    // lineitem scan (r7 planned three)
    val liScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => f
    }
    assert(liScans.size == 1,
      s"expected exactly one lineitem scan, got ${liScans.size}:\n${df.queryExecution.sparkPlan}")
  }

  test("q128 PK audit matches direct recomputation; true PKs are duplicate-free") {
    val rows = run("q128_pk_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 4)
    // the synthetic generator does NOT enforce the lineitem compound PK —
    // the audit must surface that honestly; cross-check it directly
    val li = Tables.lineitem(spark, sf)
    val nRows = li.count()
    val nKeys = li.select("l_orderkey", "l_linenumber").distinct().count()
    val (aRows, aKeys, aDups, aMax) = rows("lineitem(l_orderkey,l_linenumber)")
    assert(aRows == nRows && aKeys == nKeys)
    if (nKeys < nRows) assert(aDups > 0 && aMax > 1) else assert(aDups == 0 && aMax == 1)
    // generated surrogate ids ARE unique
    Seq("events(event_id)", "documents(doc_id)", "orders(o_orderkey)").foreach { k =>
      val (r, ks, d, m) = rows(k)
      assert(r == ks && d == 0L && m == 1L, s"$k must be duplicate-free")
    }
  }

  test("q129 checksum is row-order independent and partition-count independent") {
    val a = run("q129_table_checksum").collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // same rows through a different physical layout -> identical checksums
    val li = Tables.lineitem(spark, sf).orderBy(org.apache.spark.sql.functions.rand(7)).repartition(13)
    val h = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat_ws("|",
          org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_linenumber"),
          org.apache.spark.sql.functions.col("l_partkey"),
          org.apache.spark.sql.functions.col("l_suppkey"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("l_quantity") * 100).cast("long"))), 1, 15), 16, 10)
      .cast("long")
    val re = li.withColumn("h", h)
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag").as("grp"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.expr("bit_xor(h)").as("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    re.foreach { case (grp, v) => assert(a(("lineitem", grp)) == v, s"checksum drifted for $grp") }
  }

  test("q131 deciles are monotone in d per (side, event_type)") {
    val rows = run("q131_quantile_drift").collect()
    assert(rows.length % 9 == 0 && rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byD = rs.sortBy(_.getLong(1))
      assert(byD.map(_.getLong(2)).sliding(2).forall(p => p.head <= p.last), "va6 monotone")
      assert(byD.map(_.getLong(3)).sliding(2).forall(p => p.head <= p.last), "vb6 monotone")
      byD.foreach(r => assert(r.getLong(4) == r.getLong(3) - r.getLong(2)))
    }
  }

  test("q134 point-in-time lookup: one row per purchase, state valid at event time") {
    val out = run("q134_scd2_lookup")
    val purchases = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
    assert(out.count() == purchases.count(), "every purchase resolves exactly once")
    assert(out.filter(out("state_at").isNull || out("version_at").isNull).count() == 0)
    // re-join against the history: the resolved version's interval must
    // contain the purchase timestamp (the containment definition)
    val hist = GovernanceQueries.scd2History(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("version").as("version_at"),
        org.apache.spark.sql.functions.col("valid_from_us"),
        org.apache.spark.sql.functions.col("valid_to_us"))
    val p = purchases.selectExpr("event_id", "unix_micros(ts) AS ts_us")
    val bad = out.join(hist, Seq("user_id", "version_at")).join(p, "event_id")
      .filter(org.apache.spark.sql.functions.col("ts_us") < org.apache.spark.sql.functions.col("valid_from_us") ||
        (org.apache.spark.sql.functions.col("valid_to_us").isNotNull &&
          org.apache.spark.sql.functions.col("ts_us") >= org.apache.spark.sql.functions.col("valid_to_us")))
    assert(bad.count() == 0, "resolved interval must contain the purchase ts")
  }

  test("q135 bottom-k sketch aggregates partially (no rank window) and matches q125's order") {
    val df = run("q135_bottomk_sample")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sketch form must not plan a rank window:\n$plan")
    // partial (map-side) + final aggregate nodes both carry the function
    assert("bottomkmd5".r.findAllMatchIn(plan).size >= 2,
      s"expected partial+final bottomkmd5 aggregates:\n$plan")
    // value-identical to the window-rank definition on the same order key
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("doc_id").cast("string")),
        org.apache.spark.sql.functions.col("doc_id").cast("string"))
    val ref = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("doc_id"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(org.apache.spark.sql.functions.col("pos") <= 8)
    assert(df.join(ref, Seq("lang", "pos", "doc_id")).count() == df.count())
    assert(df.count() == ref.count())
  }

  test("q141 cadence: mean between min and max; gap count = events - users") {
    val rows = run("q141_event_cadence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, mn, mx, mean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))
      assert(n > 0 && mn >= 0 && mn <= mx && mean >= mn && mean <= mx && sum >= mn * n)
    }
    val e = Tables.events(spark, sf)
    val users = e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == e.count() - users,
      "every user contributes (events-1) gaps")
  }

  test("q125 stratified sample: exact quota per stratum, deterministic across runs") {
    val a = run("q125_group_sample").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b = run("q125_group_sample").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.sameElements(b), "md5 order must be run-stable")
    val perLang = a.groupBy(_._2)
    val langSizes = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, n) =>
      assert(perLang(lang).length == math.min(10L, n), lang)
      assert(perLang(lang).map(_._3).sorted.toSeq == (1L to math.min(10L, n)).toSeq, lang)
    }
  }

  test("q126 token drift: ratios respect min-support and the top-k is TakeOrdered, not a global sort") {
    val df = run("q126_token_drift")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5L && r.getLong(2) >= 5L, "min-support filter")
      assert(r.getLong(3) >= 0L)
    }
    assert(rows.map(_.getLong(3)).sliding(2).filter(_.length == 2)
      .forall(p => p(0) >= p(1)), "descending ratio order")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$plan")
  }

  test("q123 winsorize: bounds are the exact ceil-rank order statistics; clipped sum matches") {
    val got = run("q123_winsorize").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1000000).cast("long").as("v6"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    vals.foreach { case (et, rows) =>
      val ordered = rows.sortBy(t => (t._3, t._2)).map(_._3)
      val n = ordered.length.toLong
      val lo = ordered(((n * 5 + 99) / 100 - 1).toInt)
      val hi = ordered(((n * 95 + 99) / 100 - 1).toInt)
      val clipped = ordered.map(v => math.max(lo, math.min(hi, v)))
      assert(got(et) == ((n, lo, hi,
        ordered.count(_ < lo).toLong, ordered.count(_ > hi).toLong, clipped.sum)), et)
    }
  }
}
