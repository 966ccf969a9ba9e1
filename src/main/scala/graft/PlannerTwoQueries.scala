package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Planner/storage third wave (round 10, thirty-sixth wave): linear-
  * sort vs Z-order layout bake-off, histogram-estimator feedback,
  * join-order cost ground truth, and a partition-sizing advisor.
  *
  * Reference intent: the reference leaves layout and planning to
  * Postgres defaults; these are the decisions a lake-scale deployment
  * makes with DATA, not vibes. Everything is exact-integer and
  * engine-mirrored; layouts are evaluated ANALYTICALLY (file = ntile
  * bucket of the candidate ordering, min/max zone maps per file) so
  * the bake-off costs two ranks and an aggregate, not two physical
  * rewrites of the corpus.
  */
object PlannerTwoQueries {

  /** Morton interleave of two 4-bit values — Spark and DuckDB spell
    * the same bit algebra. */
  private def sparkZ4(x: String, y: String): String =
    (0 until 4).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})").mkString(" + ")
  private def duckZ4(x: String, y: String): String =
    (0 until 4).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})").mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G262: linear-sort vs Z-order layout bake-off ───────────────────
    // Which layout skips more files for 2-D range probes? Both
    // candidate layouts are simulated analytically: "file" = 16-way
    // distributedNtile bucket under (x,y,key) linear order vs under
    // (morton(x,y),key); per-file zone maps (min/max of both dims)
    // come from one aggregate each; 20 hash-derived 4×4 rectangle
    // probes count intersecting files per layout. The verdict row per
    // layout carries total probe-file touches — the number OPTIMIZE
    // ZORDER exists to shrink. Corpus cost: two rank passes (scale-
    // safe), two 16-row aggregates, a 20×16 broadcast probe join.
    "q317_layout_bakeoff" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        expr("o_custkey % 16").as("x"),
        (month(col("o_orderdate")) - 1).cast(LongType).as("y"))
        .withColumn("z", expr(sparkZ4("x", "y")))
      def zoneMaps(order: Seq[org.apache.spark.sql.Column], layout: String): DataFrame =
        graft.ops.Relational.distributedNtile(o, order, 16,
            o.agg(count(lit(1)).as("n_total")), "f")
          .groupBy(lit(layout).as("layout"), col("f"))
          .agg(min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
      val files = zoneMaps(Seq(col("x").asc, col("y").asc, col("k").asc), "1_linear")
        .unionAll(zoneMaps(Seq(col("z").asc, col("k").asc), "2_zorder"))
      val probes = s.range(0, 20).select(col("id").as("p"))
        .withColumn("xlo", expr("cast(conv(substring(md5(concat('px', cast(p as string))), 1, 4), 16, 10) as bigint) % 13"))
        .withColumn("ylo", expr("cast(conv(substring(md5(concat('py', cast(p as string))), 1, 4), 16, 10) as bigint) % 9"))
        .withColumn("xhi", col("xlo") + 3).withColumn("yhi", col("ylo") + 3)
      files.join(broadcast(probes),
          col("min_x") <= col("xhi") && col("max_x") >= col("xlo") &&
            col("min_y") <= col("yhi") && col("max_y") >= col("ylo"))
        .groupBy("layout")
        .agg(countDistinct("f").as("n_files_touched"),
          count(lit(1)).as("file_touches"),
          (count(lit(1)) * 5).as("avg_files_per_probe_e2")) // ×100/20 probes
        .orderBy("layout")
    }),

    // ── G263: histogram-estimator feedback (CBO calibration loop) ──────
    // q224 audits one range estimate; this op closes the loop: 10
    // hash-derived price ranges, each estimated from a 16-bucket
    // equi-depth histogram (whole-buckets-contained floor — the
    // documented conservative form) and compared to the exact count.
    // The signed e4 error per probe plus the global calibration factor
    // Σactual·1e4 div Σestimate is what a CBO writes back as its
    // correction. Histogram boundaries via distributedNtile, probes
    // broadcast.
    "q318_estimator_feedback" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v2"),
          col("o_orderkey"))
      val n = v.agg(count(lit(1)).as("n_total"))
      val hist = graft.ops.Relational.distributedNtile(v,
          Seq(col("v2").asc, col("o_orderkey").asc), 16, n, "b")
        .groupBy("b").agg(count(lit(1)).as("bn"), min("v2").as("blo"), max("v2").as("bhi"))
      val bounds = v.agg(min("v2").as("vmin"), max("v2").as("vmax"))
      val probes = s.range(0, 10).select(col("id").as("p"))
        .crossJoin(broadcast(bounds))
        .withColumn("h1", expr("cast(conv(substring(md5(concat('lo', cast(p as string))), 1, 6), 16, 10) as bigint)"))
        .withColumn("h2", expr("cast(conv(substring(md5(concat('hi', cast(p as string))), 1, 6), 16, 10) as bigint)"))
        .withColumn("lo", expr("vmin + h1 % greatest(vmax - vmin, 1)"))
        .withColumn("hi", expr("least(lo + (vmax - vmin) div 4 + h2 % greatest((vmax - vmin) div 4, 1), vmax)"))
        .select("p", "lo", "hi")
      val est = probes.join(hist,
          col("blo") >= col("lo") && col("bhi") <= col("hi"), "left")
        .groupBy("p", "lo", "hi")
        .agg(coalesce(sum("bn"), lit(0L)).as("est_rows"))
      // actual side: the CORPUS drives the join with the 10 probes
      // broadcast (an outer probe-side join would have to build the
      // corpus as the BNLJ build side); zero-hit probes refill via the
      // left join below
      val act = v.join(broadcast(probes),
          col("v2") >= col("lo") && col("v2") <= col("hi"))
        .groupBy("p").agg(count(lit(1)).as("act_rows"))
      val per = est.join(act, Seq("p"), "left")
        .na.fill(0L, Seq("act_rows"))
        .withColumn("err_e4", expr(
          "(est_rows - act_rows) * 10000 div greatest(act_rows, 1)"))
      per.crossJoin(broadcast(per.agg(
          expr("sum(act_rows) * 10000 div greatest(sum(est_rows), 1)").as("calib_e4"))))
        .select("p", "lo", "hi", "est_rows", "act_rows", "err_e4", "calib_e4")
        .orderBy("p")
    }),

    // ── G264: join-order cost ground truth (planner post-mortem) ───────
    // For the filtered star li ⋈ o ⋈ c, compute EXACTLY what a CBO
    // estimates: the base cardinalities after filters and both
    // intermediate sizes (li⋈o first vs o⋈c first), then the order a
    // cost model summing intermediates should have picked. The table a
    // planner regression suite diffs its estimates against; one pass
    // per cardinality, all equi-joins.
    "q319_join_order_truth" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"))
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val nLi = li.agg(count(lit(1)).as("card_li"))
      val nO = o.agg(count(lit(1)).as("card_o"))
      val nC = c.agg(count(lit(1)).as("card_c"))
      val liO = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("card_li_o"))
      val oC = o.join(c, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("card_o_c"))
      val fin = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("card_final"))
      nLi.crossJoin(nO).crossJoin(nC).crossJoin(liO).crossJoin(oC).crossJoin(fin)
        .withColumn("best_first_join", expr(
          "case when card_li_o <= card_o_c then 'li_join_o' else 'o_join_c' end"))
    }),

    // ── G265: partition-sizing advisor (the 128 MB rule as a query) ────
    // For every table: exact row count × a schema-derived per-row byte
    // estimate (FIXED literals shared with the oracle — column widths
    // are plan-time facts, not data), the projected size, and the
    // shuffle-partition count targeting 128 MB with a pow-2 ceiling
    // for even task folding. The numbers spark.sql.shuffle.partitions
    // should be SET from, instead of the default 200 this library
    // already overrides.
    "q320_partition_advisor" -> ((s, dir) => {
      def row(name: String, df: DataFrame, rowBytes: Long): DataFrame =
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("table_name"), col("n_rows"),
            lit(rowBytes).as("row_bytes"))
      val t = row("customer", Tables.customer(s, dir), 120L)
        .unionAll(row("documents", Tables.documents(s, dir), 600L))
        .unionAll(row("embeddings", Tables.embeddings(s, dir), 280L))
        .unionAll(row("events", Tables.events(s, dir), 110L))
        .unionAll(row("lineitem", Tables.lineitem(s, dir), 140L))
        .unionAll(row("orders", Tables.orders(s, dir), 100L))
      t.withColumn("est_mb", expr("n_rows * row_bytes div 1048576"))
        .withColumn("parts_128mb", expr("greatest((n_rows * row_bytes + 134217727) div 134217728, 1)"))
        // next-pow-2 via bit length — log2 doubles round differently
        // across libm builds at exact powers, the bit form cannot
        .withColumn("parts_pow2", expr(
          "cast(case when parts_128mb = 1 then 1 else shiftleft(1, length(bin(parts_128mb - 1))) end as bigint)"))
        .orderBy("table_name")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q317_layout_bakeoff" ->
      s"""WITH o AS (SELECT o_orderkey AS k, o_custkey % 16 AS x,
         |             CAST(month(o_orderdate) - 1 AS BIGINT) AS y
         |           FROM orders),
         |oz AS (SELECT *, ${duckZ4("x", "y")} AS z FROM o),
         |lin AS (SELECT '1_linear' AS layout,
         |          CAST(NTILE(16) OVER (ORDER BY x, y, k) AS BIGINT) AS f, x, y FROM oz),
         |zor AS (SELECT '2_zorder',
         |          CAST(NTILE(16) OVER (ORDER BY z, k) AS BIGINT), x, y FROM oz),
         |files AS (SELECT layout, f, MIN(x) AS min_x, MAX(x) AS max_x,
         |                 MIN(y) AS min_y, MAX(y) AS max_y
         |          FROM (SELECT * FROM lin UNION ALL SELECT * FROM zor)
         |          GROUP BY layout, f),
         |pr AS (SELECT p,
         |         CAST('0x' || substr(md5('px' || CAST(p AS VARCHAR)), 1, 4) AS BIGINT) % 13 AS xlo,
         |         CAST('0x' || substr(md5('py' || CAST(p AS VARCHAR)), 1, 4) AS BIGINT) % 9 AS ylo
         |       FROM (SELECT UNNEST(range(0, 20)) AS p)),
         |pp AS (SELECT p, xlo, xlo + 3 AS xhi, ylo, ylo + 3 AS yhi FROM pr)
         |SELECT layout, CAST(COUNT(DISTINCT f) AS BIGINT) AS n_files_touched,
         |       CAST(COUNT(*) AS BIGINT) AS file_touches,
         |       CAST(COUNT(*) * 5 AS BIGINT) AS avg_files_per_probe_e2
         |FROM files JOIN pp ON min_x <= xhi AND max_x >= xlo
         |                   AND min_y <= yhi AND max_y >= ylo
         |GROUP BY layout ORDER BY layout""".stripMargin,

    "q318_estimator_feedback" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v2, o_orderkey
        |           FROM orders),
        |d AS (SELECT v2, CAST(NTILE(16) OVER (ORDER BY v2, o_orderkey) AS BIGINT) AS b
        |      FROM v),
        |h AS (SELECT b, COUNT(*) AS bn, MIN(v2) AS blo, MAX(v2) AS bhi FROM d GROUP BY b),
        |bd AS (SELECT MIN(v2) AS vmin, MAX(v2) AS vmax FROM v),
        |pr AS (SELECT p,
        |         CAST('0x' || substr(md5('lo' || CAST(p AS VARCHAR)), 1, 6) AS BIGINT) AS h1,
        |         CAST('0x' || substr(md5('hi' || CAST(p AS VARCHAR)), 1, 6) AS BIGINT) AS h2
        |       FROM (SELECT UNNEST(range(0, 10)) AS p)),
        |pp AS (SELECT p, vmin + h1 % GREATEST(vmax - vmin, 1) AS lo,
        |         LEAST(vmin + h1 % GREATEST(vmax - vmin, 1) + (vmax - vmin) // 4
        |               + h2 % GREATEST((vmax - vmin) // 4, 1), vmax) AS hi
        |       FROM pr, bd),
        |est AS (SELECT p, lo, hi, COALESCE(SUM(bn), 0) AS est_rows
        |        FROM pp LEFT JOIN h ON blo >= lo AND bhi <= hi
        |        GROUP BY p, lo, hi),
        |act AS (SELECT p, COUNT(v2) AS act_rows
        |        FROM pp LEFT JOIN v ON v2 >= lo AND v2 <= hi GROUP BY p),
        |per AS (SELECT est.p, lo, hi, est_rows, act_rows,
        |          (est_rows - act_rows) * 10000 // GREATEST(act_rows, 1) AS err_e4
        |        FROM est JOIN act ON est.p = act.p),
        |cal AS (SELECT SUM(act_rows) * 10000 // GREATEST(SUM(est_rows), 1) AS calib_e4
        |        FROM per)
        |SELECT CAST(p AS BIGINT) AS p, lo, hi,
        |       CAST(est_rows AS BIGINT) AS est_rows,
        |       CAST(act_rows AS BIGINT) AS act_rows,
        |       CAST(err_e4 AS BIGINT) AS err_e4,
        |       CAST(calib_e4 AS BIGINT) AS calib_e4
        |FROM per, cal ORDER BY p""".stripMargin,

    "q319_join_order_truth" ->
      """WITH li AS (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25),
        |o AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |x AS (SELECT
        |  (SELECT COUNT(*) FROM li) AS card_li,
        |  (SELECT COUNT(*) FROM o) AS card_o,
        |  (SELECT COUNT(*) FROM c) AS card_c,
        |  (SELECT COUNT(*) FROM li JOIN o ON l_orderkey = o_orderkey) AS card_li_o,
        |  (SELECT COUNT(*) FROM o JOIN c ON o_custkey = c_custkey) AS card_o_c,
        |  (SELECT COUNT(*) FROM li JOIN o ON l_orderkey = o_orderkey
        |     JOIN c ON o_custkey = c_custkey) AS card_final)
        |SELECT CAST(card_li AS BIGINT) AS card_li, CAST(card_o AS BIGINT) AS card_o,
        |       CAST(card_c AS BIGINT) AS card_c,
        |       CAST(card_li_o AS BIGINT) AS card_li_o,
        |       CAST(card_o_c AS BIGINT) AS card_o_c,
        |       CAST(card_final AS BIGINT) AS card_final,
        |       CASE WHEN card_li_o <= card_o_c THEN 'li_join_o' ELSE 'o_join_c' END AS best_first_join
        |FROM x""".stripMargin,

    "q320_partition_advisor" ->
      """WITH t AS (
        |  SELECT 'customer' AS table_name, (SELECT COUNT(*) FROM customer) AS n_rows, 120 AS row_bytes
        |  UNION ALL SELECT 'documents', (SELECT COUNT(*) FROM documents), 600
        |  UNION ALL SELECT 'embeddings', (SELECT COUNT(*) FROM embeddings), 280
        |  UNION ALL SELECT 'events', (SELECT COUNT(*) FROM events), 110
        |  UNION ALL SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem), 140
        |  UNION ALL SELECT 'orders', (SELECT COUNT(*) FROM orders), 100)
        |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(row_bytes AS BIGINT) AS row_bytes,
        |       CAST(n_rows * row_bytes // 1048576 AS BIGINT) AS est_mb,
        |       CAST(GREATEST((n_rows * row_bytes + 134217727) // 134217728, 1) AS BIGINT) AS parts_128mb,
        |       CAST(CASE WHEN GREATEST((n_rows * row_bytes + 134217727) // 134217728, 1) = 1 THEN 1
        |            ELSE 1 << length(bin(GREATEST((n_rows * row_bytes + 134217727) // 134217728, 1) - 1))
        |            END AS BIGINT) AS parts_pow2
        |FROM t ORDER BY table_name""".stripMargin
  )
}
