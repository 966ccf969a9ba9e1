package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.{tokens, sqlTokens}
import graft.ops.Relational.boundedGlobalRank

/** Signal-extraction second wave (round 10, thirty-third wave):
  * TextRank keyword extraction over the word co-occurrence graph,
  * cross-source tf-vector similarity, recommendation coverage/novelty
  * audit, and an SLO error-budget burn-down.
  *
  * Reference intent: none of these exist in the reference — they are
  * the signal ops a content/commerce platform derives from the same
  * tables this library already certifies: which words matter
  * (TextRank, Mihalcea 2004), which sources overlap (vector-space
  * model), whether recommendations explore the catalog, and when the
  * error budget runs out (SRE workbook). All exact-integer; graph and
  * matrix sizes are vocabulary/source-bounded, never corpus-bounded.
  */
object SignalsTwoQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G250: TextRank keyword extraction (2 exact PR iterations) ──────
    // Undirected word graph: adjacent-token co-occurrence counts,
    // restricted to the top-200 words (TakeOrdered — bounds the graph
    // at any corpus size); two integer PageRank iterations with d=0.85
    // as the exact 85/100 floor (q150's discipline, here weighted:
    // contribution = pr(u)·w(u,v) div wdeg(u)). Top-20 keywords by
    // final rank. Corpus cost: one bigram explode; everything after is
    // vocabulary-sized.
    "q305_textrank_keywords" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(expr("size(t) >= 2"))
      val bigrams = toks.select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
        .filter(col("w1") =!= col("w2"))
      val vocab = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w").asc).limit(200)
        .select("w")
      val edges = bigrams
        .join(broadcast(vocab).withColumnRenamed("w", "w1"), Seq("w1"), "left_semi")
        .join(broadcast(vocab).withColumnRenamed("w", "w2"), Seq("w2"), "left_semi")
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val undirected = edges.select(col("w1").as("u"), col("w2").as("v"), col("c"))
        .unionAll(edges.select(col("w2").as("u"), col("w1").as("v"), col("c")))
        .groupBy("u", "v").agg(sum("c").as("wgt"))
      val wdeg = undirected.groupBy("u").agg(sum("wgt").as("wdeg"))
      val adj = undirected.join(wdeg, Seq("u"))
      def iterate(pr: DataFrame): DataFrame = adj
        .join(pr.withColumnRenamed("w", "u"), Seq("u"))
        .groupBy(col("v").as("w"))
        .agg(sum(expr("pr * wgt div wdeg")).as("inflow"))
        .select(col("w"), expr("150000 + 85 * inflow div 100").as("pr"))
      val pr0 = wdeg.select(col("u").as("w"), lit(1000000L).as("pr"))
      val pr2 = iterate(iterate(pr0))
      pr2.orderBy(col("pr").desc, col("w").asc).limit(20)
        .withColumn("rk", row_number().over(
          boundedGlobalRank(col("pr").desc, col("w").asc)).cast(LongType))
        .select("rk", "w", "pr")
        .orderBy("rk")
    }),

    // ── G251: cross-source tf-vector similarity (corpus overlap map) ───
    // Vector-space similarity between sources: per-source token tf
    // vectors, pairwise cos² = (Σ tf_a·tf_b)² / (Σtf_a²·Σtf_b²) — the
    // SQUARED cosine is an exact rational (no sqrt anywhere), floored
    // at e6 in DECIMAL(38,0). One token scan → |sources|·|vocab| tf
    // rows; the pair join is vocabulary-keyed with |sources|² output.
    // The near-duplicate SOURCE detector (two mirrors of one crawl
    // show cos² ≈ 1) — q95's vocabulary-overlap audit upgraded with
    // frequency weight.
    "q306_source_similarity" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("tf"))
      val norms = tf.groupBy("source")
        .agg(sum(expr("cast(tf as decimal(38,0)) * tf")).as("n2"))
      val dots = tf.select(col("source").as("sa"), col("w"), col("tf").as("ta"))
        .join(tf.select(col("source").as("sb"), col("w"), col("tf").as("tb")), Seq("w"))
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(sum(expr("cast(ta as decimal(38,0)) * tb")).as("dot"))
      dots
        .join(norms.select(col("source").as("sa"), col("n2").as("na")), Seq("sa"))
        .join(norms.select(col("source").as("sb"), col("n2").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"),
          expr("cast(dot * dot * 1000000 div (na * nb) as bigint)").as("cos2_e6"))
        .orderBy(col("cos2_e6").desc, col("sa").asc, col("sb").asc)
        .limit(20)
    }),

    // ── G252: recommendation coverage / novelty audit ──────────────────
    // Does the "also bought" surface explore the catalog or rehash the
    // head? Per-item top-3 co-purchase partners (the q207 lift table,
    // re-derived with a partitioned rank), then: catalog coverage =
    // distinct recommended / distinct sold (e4), and novelty = mean
    // popularity rank of recommendations (e4 of the max rank — 1e4 =
    // recommending the longest tail). Exact integers; popularity ranks
    // via one |items|-row window on the item table (item-bounded).
    "q307_rec_coverage" -> ((s, dir) => {
      // localCheckpoint (optimization r15, guide §3.3): `li` feeds the
      // popularity aggregate and BOTH sides of the co-purchase self-join
      // — lazy, the scan + distinct shuffle ran three times
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        .distinct()
        .localCheckpoint()
      val pop = li.groupBy("l_partkey").agg(count(lit(1)).as("n_orders"))
      val nItems = pop.agg(count(lit(1)).as("n_catalog"),
        max("n_orders").as("max_orders"))
      // popularity rank over the ITEM table — item-grain still scales
      // with the catalog, so the rank is contiguousIds over a range-
      // partitioned sort (scale-safe), not a global window
      val popRank = graft.ops.Relational.contiguousIds(
          pop.repartitionByRange(32, col("n_orders").desc, col("l_partkey").asc)
            .sortWithinPartitions(col("n_orders").desc, col("l_partkey").asc), "pr0")
        .select(col("l_partkey"), (col("pr0") + 1).as("prank"))
      val co = li.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), Seq("l_orderkey"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cc"))
      // localCheckpoint: `recs` feeds the coverage count AND the novelty
      // join — lazy, the basket² co-purchase self-join + rank window
      // (the whole query's cost) ran twice
      val recs = co.withColumn("rn", row_number().over(
          Window.partitionBy("a").orderBy(col("cc").desc, col("b").asc)))
        .filter(col("rn") <= 3)
        .select("b") // both consumers read only the recommended item
        .localCheckpoint()
      val nRec = recs.select(col("b")).distinct().agg(count(lit(1)).as("n_recommended"))
      val novelty = recs.join(popRank.withColumnRenamed("l_partkey", "b"), Seq("b"))
        .agg(count(lit(1)).as("n_rec_slots"), sum("prank").as("rank_sum"))
      nRec.crossJoin(novelty).crossJoin(nItems)
        .select(col("n_catalog"), col("n_recommended"),
          expr("n_recommended * 10000 div n_catalog").as("coverage_e4"),
          col("n_rec_slots"),
          expr("rank_sum * 10000 div (n_rec_slots * n_catalog)").as("novelty_e4"))
    }),

    // ── G253: SLO error-budget burn-down (exhaustion ledger) ───────────
    // Error budget: 1% of events per calendar month may be 'error'.
    // Daily error counts → month-partitioned cumulative burn (the
    // window is PARTITIONED by month — never global), exhaustion day =
    // the first day
    // the month-to-date error mass exceeds 1% of month-to-date events.
    // Emits per month: totals, attained rate e4, days over budget, and
    // the exhaustion day (null = budget held). The SRE table that
    // decides freeze-vs-ship.
    "q308_error_budget" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("ev"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      val w = Window.partitionBy("month").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily
        .withColumn("cum_ev", sum("ev").over(w))
        .withColumn("cum_err", sum("err").over(w))
        .withColumn("over", expr("cum_err * 100 > cum_ev"))
      cum.groupBy("month")
        .agg(sum("ev").as("n_events"), sum("err").as("n_errors"),
          expr("sum(err) * 10000 div sum(ev)").as("rate_e4"),
          sum(when(col("over"), 1L).otherwise(0L)).as("days_over"),
          min(when(col("over"), col("day"))).as("exhausted_on"))
        .orderBy("month")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q305_textrank_keywords" ->
      s"""WITH t AS (SELECT ${sqlTokens("text")} AS t FROM documents
         |           WHERE len(${sqlTokens("text")}) >= 2),
         |bg AS (SELECT unnest(list_transform(range(1, len(t)),
         |         i -> {'w1': t[CAST(i AS INT)], 'w2': t[CAST(i AS INT) + 1]})) AS b
         |       FROM t),
         |bp AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bg WHERE b.w1 != b.w2),
         |vocab AS (SELECT w FROM (SELECT unnest(${sqlTokens("text")}) AS w FROM documents)
         |          GROUP BY w ORDER BY COUNT(*) DESC, w LIMIT 200),
         |e AS (SELECT w1, w2, COUNT(*) AS c FROM bp
         |      WHERE w1 IN (SELECT w FROM vocab) AND w2 IN (SELECT w FROM vocab)
         |      GROUP BY w1, w2),
         |und AS (SELECT u, v, SUM(c) AS wgt FROM (
         |          SELECT w1 AS u, w2 AS v, c FROM e
         |          UNION ALL SELECT w2, w1, c FROM e)
         |        GROUP BY u, v),
         |wd AS (SELECT u, SUM(wgt) AS wdeg FROM und GROUP BY u),
         |p0 AS (SELECT u AS w, CAST(1000000 AS BIGINT) AS pr FROM wd),
         |p1 AS (SELECT und.v AS w,
         |         150000 + 85 * SUM(p0.pr * und.wgt // wd.wdeg) // 100 AS pr
         |       FROM und JOIN wd USING (u) JOIN p0 ON p0.w = und.u
         |       GROUP BY und.v),
         |p2 AS (SELECT und.v AS w,
         |         150000 + 85 * SUM(p1.pr * und.wgt // wd.wdeg) // 100 AS pr
         |       FROM und JOIN wd USING (u) JOIN p1 ON p1.w = und.u
         |       GROUP BY und.v)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, w) AS BIGINT) AS rk,
         |       w, CAST(pr AS BIGINT) AS pr
         |FROM p2 ORDER BY pr DESC, w LIMIT 20""".stripMargin,

    "q306_source_similarity" ->
      s"""WITH tf AS (SELECT source, w, COUNT(*) AS tf FROM
         |    (SELECT source, unnest(${sqlTokens("text")}) AS w FROM documents)
         |  GROUP BY source, w),
         |n AS (SELECT source, SUM(CAST(tf AS HUGEINT) * tf) AS n2 FROM tf GROUP BY source),
         |d AS (SELECT a.source AS sa, b.source AS sb,
         |        SUM(CAST(a.tf AS HUGEINT) * b.tf) AS dot
         |      FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
         |      GROUP BY a.source, b.source)
         |SELECT sa, sb,
         |       CAST(dot * dot * 1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_e6
         |FROM d JOIN n na ON d.sa = na.source JOIN n nb ON d.sb = nb.source
         |ORDER BY cos2_e6 DESC, sa, sb LIMIT 20""".stripMargin,

    "q307_rec_coverage" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pop AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY l_partkey),
        |ni AS (SELECT COUNT(*) AS n_catalog FROM pop),
        |pr AS (SELECT l_partkey,
        |         CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, l_partkey) AS BIGINT) AS prank
        |       FROM pop),
        |co AS (SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS cc
        |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                           AND a.l_partkey != b.l_partkey
        |       GROUP BY a.l_partkey, b.l_partkey),
        |recs AS (SELECT a, b FROM (
        |           SELECT *, ROW_NUMBER() OVER (PARTITION BY a
        |             ORDER BY cc DESC, b) AS rn FROM co)
        |         WHERE rn <= 3),
        |nr AS (SELECT COUNT(DISTINCT b) AS n_recommended FROM recs),
        |nv AS (SELECT COUNT(*) AS n_rec_slots, SUM(prank) AS rank_sum
        |       FROM recs JOIN pr ON recs.b = pr.l_partkey)
        |SELECT CAST(n_catalog AS BIGINT) AS n_catalog,
        |       CAST(n_recommended AS BIGINT) AS n_recommended,
        |       CAST(n_recommended * 10000 // n_catalog AS BIGINT) AS coverage_e4,
        |       CAST(n_rec_slots AS BIGINT) AS n_rec_slots,
        |       CAST(rank_sum * 10000 // (n_rec_slots * n_catalog) AS BIGINT) AS novelty_e4
        |FROM nr, nv, ni""".stripMargin,

    "q308_error_budget" ->
      """WITH daily AS (SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS day,
        |                 COUNT(*) AS ev,
        |                 SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
        |               FROM events GROUP BY 1, 2),
        |c AS (SELECT *, SUM(ev) OVER w AS cum_ev, SUM(err) OVER w AS cum_err
        |      FROM daily
        |      WINDOW w AS (PARTITION BY month ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |o AS (SELECT *, cum_err * 100 > cum_ev AS over_b FROM c)
        |SELECT month, CAST(SUM(ev) AS BIGINT) AS n_events,
        |       CAST(SUM(err) AS BIGINT) AS n_errors,
        |       CAST(SUM(err) * 10000 // SUM(ev) AS BIGINT) AS rate_e4,
        |       CAST(SUM(CASE WHEN over_b THEN 1 ELSE 0 END) AS BIGINT) AS days_over,
        |       MIN(CASE WHEN over_b THEN day END) AS exhausted_on
        |FROM o GROUP BY month ORDER BY month""".stripMargin
  )
}
