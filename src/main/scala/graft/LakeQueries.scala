package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lakehouse / retrieval-quality operators (round 9, sixth wave): MIPS
  * norm-bound pruning, schema-evolution reads, a blocking
  * precision/recall audit, market-basket affinity, and the JSON
  * document round-trip.
  *
  * Reference intent: the reference stores rows in Postgres and JSON on
  * Kafka (services/forecast-service/app/main.py, spark_streaming.py) — at 100 TB the same
  * data lives in evolving parquet snapshots and document blobs, vector
  * indexes answer dot-product queries, and the sales domain's own
  * classic (which products sell together) becomes a corpus-scale
  * aggregation. Same house rules: deterministic fixtures, exact
  * integer arithmetic, bounded fan-outs, oracled end to end.
  */
object LakeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G140: MIPS norm-bound pruning audit (dot-product top-k) ────────
    // Cosine ignores magnitude; recommendation models rank by INNER
    // PRODUCT, where the Cauchy-Schwarz bound dot(q,v) ≤ |q|·|v| powers
    // index pruning: any vector whose norm bound can't reach the
    // current k-th best is provably skippable. This operator computes
    // the exact e12-int dot top-k for query vector 0 AND the pruning
    // ledger — how many vectors a norm-ordered index could skip — in
    // one query. All integer: dot and |v|² are BIGINT-exact, the bound
    // check squares both sides ((|q|·|v|)² = qq·vv ≥ dot_k² with signs
    // handled), so the ledger is oracled, not estimated. The broadcast
    // scan is q26's shape; the ledger is one conditional aggregate.
    "q195_mips_prune" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("transform(cast(embedding as array<double>), x -> cast(round(x * 1000000) as bigint))").as("x6"))
        .withColumn("vv", expr("aggregate(x6, 0L, (a, b) -> a + b * b)"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("x6").as("q6"), col("vv").as("qq"))
      val scored = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("dot", expr(
          "aggregate(zip_with(x6, q6, (x, y) -> x * y), 0L, (a, b) -> a + b)"))
      val kth = scored.select(col("dot"))
        .orderBy(col("dot").desc).limit(10)
        .agg(min("dot").as("dot_k"))
      scored.crossJoin(broadcast(kth))
        .agg(count(lit(1)).as("n_vectors"),
          min("dot_k").as("dot_k"),
          // prunable: even a perfectly aligned vector can't reach dot_k —
          // qq·vv < dot_k² (dot_k > 0 on this corpus; both sides BIGINT-
          // safe via DECIMAL lift)
          sum(when(
            expr("cast(qq as decimal(38,0)) * vv < cast(dot_k as decimal(38,0)) * dot_k")
              && col("dot_k") > 0, 1L).otherwise(0L)).as("n_prunable"))
        .withColumn("prunable_e4", expr("n_prunable * 10000 div n_vectors"))
    }),

    // ── G141: schema-evolution read (mergeSchema over snapshots) ───────
    // Tables grow columns; a lake read must union schemas across
    // snapshot generations and null-fill the history. The fixture lands
    // two parquet batches — generation 1 (orderkey, status), generation
    // 2 adds price2 — and the mergeSchema read reports, per generation,
    // row counts and how many rows carry the late column. The count
    // ledger IS the migration audit ("how much history predates the
    // column"); schema-on-read, no rewrite of generation 1 — the only
    // sane move at 100 TB. Oracle re-derives from orders + the same
    // generation rule (orderkey parity).
    "q196_schema_evolution" -> ((s, dir) => {
      val src = PipelineQueries.cachedFixture(s"schemaevo|$dir") { work =>
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("orderkey"),
            col("o_orderstatus").as("status"),
            lit(1L).as("generation"))
          .write.mode("overwrite").parquet(s"$work/t/g=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("orderkey"),
            col("o_orderstatus").as("status"),
            lit(2L).as("generation"),
            expr("cast(round(o_totalprice * 100) as bigint)").as("price2"))
          .write.mode("overwrite").parquet(s"$work/t/g=2")
      } + "/t"
      s.read.option("mergeSchema", "true")
        .parquet(s"$src/g=1", s"$src/g=2")
        .groupBy("generation")
        .agg(count(lit(1)).as("n_rows"),
          count(col("price2")).as("n_with_price"),
          sum(coalesce(col("price2"), lit(0L))).as("sum_price2"))
        .orderBy("generation")
    }),

    // ── G142: blocking precision/recall audit (lossy vs exact join) ────
    // q151's sort-key blocking is DELIBERATELY lossy; this closes the
    // loop by measuring it against q144's complete answer — precision
    // (approx pairs that are real) and recall (real pairs found) as
    // exact e4 rationals, computed by joining two declared queries
    // (the q69 audit pattern, lifted from ANN to the dedup join; the
    // exact side reads the landed q144 snapshot — ppjPairsTable — the
    // way a real audit reads the gold table instead of recomputing it).
    // Every index deployment runs exactly this audit on a sampled
    // window before trusting the cheap path.
    "q197_blocking_quality" -> ((s, dir) => {
      val exact = IndexQueries.ppjPairsTable(s, dir)
        .select("doc_a", "doc_b")
      val approx = IndexQueries.queries("q151_simkey_blocking")(s, dir)
        .select("doc_a", "doc_b")
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      val nA = approx.agg(count(lit(1)).as("n_approx"))
      val common = exact.join(approx, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_common"))
      nE.crossJoin(nA).crossJoin(common)
        .withColumn("precision_e4", expr("n_common * 10000 div n_approx"))
        .withColumn("recall_e4", expr("n_common * 10000 div n_exact"))
    }),

    // ── G143: market-basket affinity (co-purchase lift, top-20) ────────
    // The sales classic: which part pairs appear in the same order more
    // than chance predicts. Pairs explode per order (TPC-H fan-out ≤ 7
    // items ⇒ ≤ 21 pairs per order — bounded by basket size, never by
    // corpus), support counts aggregate map-side, and lift =
    // P(a∧b)/(P(a)·P(b)) is the exact e4 rational
    // (co·N·10⁴) div (na·nb) with DECIMAL lift. Min support 5 co-orders
    // prunes the noise tail BEFORE the rank; top-20 by (lift, pair)
    // via TakeOrdered. The co-occurrence matrix lands once per snapshot
    // (basketTables, shared with q207's CF scorer) — one orderkey
    // shuffle + one pair aggregate at build, table reads after.
    "q198_basket_affinity" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val (items, co) = basketTables(s, dir)
      val nOrders = items.select("okey").distinct().agg(count(lit(1)).as("n_orders"))
      val pf = items.groupBy("pk").agg(count(lit(1)).as("pn"))
      val pairs = co.filter(col("co") >= 5)
      pairs
        .join(pf.select(col("pk").as("pa"), col("pn").as("na")), Seq("pa"))
        .join(pf.select(col("pk").as("pb"), col("pn").as("nb")), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .withColumn("lift_e4", expr(
          "cast((cast(co as decimal(38,0)) * n_orders * 10000) div " +
            "(cast(na as decimal(38,0)) * nb) as bigint)"))
        .select("pa", "pb", "co", "na", "nb", "lift_e4")
        .orderBy(col("lift_e4").desc, col("pa"), col("pb"))
        .limit(20)
    }),

    // ── G144: JSON document round-trip (document-store envelope) ───────
    // The document shape: each order serialized as one JSON blob with a
    // nested items array (to_json over struct + collect_list — the X10
    // write half), then parsed back (from_json with an explicit array-
    // of-struct schema), items exploded, and revenue re-aggregated per
    // status. Green means serialize∘parse∘explode ≡ identity on the
    // relational form — the audit that makes a document sink safe. The
    // JSON fixture lands once (a corpus snapshot); the read path is
    // schema-on-parse, splittable, and the e2-int revenue matches the
    // direct lineitem aggregate digit for digit.
    "q199_json_roundtrip" -> ((s, dir) => {
      val src = PipelineQueries.cachedFixture(s"jsondocs|$dir") { work =>
        Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("okey"),
            col("l_linenumber").as("ln"),
            expr("cast(round(l_extendedprice * 100) as bigint)").as("price2"))
          .groupBy("okey")
          .agg(sort_array(collect_list(struct(col("ln"), col("price2")))).as("items"))
          .join(Tables.orders(s, dir).select(col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status")), Seq("okey"))
          .select(to_json(struct(col("okey"), col("status"), col("items"))).as("doc"))
          .write.mode("overwrite").text(s"$work/docs")
      } + "/docs"
      val schema = StructType(Seq(
        StructField("okey", LongType),
        StructField("status", StringType),
        StructField("items", ArrayType(StructType(Seq(
          StructField("ln", LongType), StructField("price2", LongType)))))))
      s.read.text(src)
        .select(from_json(col("value"), schema).as("d"))
        .select(col("d.status").as("status"), explode(col("d.items")).as("it"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_items"), sum(col("it.price2")).as("revenue2"))
        .orderBy("status")
    })
  )

  /** Materialized basket tables — distinct (order, part) rows and the
    * undirected co-order pair counts (pa < pb) — one build per
    * (JVM, sfDir), shared by q198's affinity rank and q207's CF
    * scoring the way a recommender pipeline lands its co-occurrence
    * matrix once per snapshot. Pair fan-out is bounded by basket size
    * (≤21 rows per order) at any corpus scale. */
  private[graft] def basketTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val work = PipelineQueries.cachedFixture(s"baskets|$dir") { work =>
      val items = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk")).distinct()
      items.write.mode("overwrite").parquet(s"$work/items")
      val it = s.read.parquet(s"$work/items")
      it.select(col("okey"), col("pk").as("pa"))
        .join(it.select(col("okey"), col("pk").as("pb")), Seq("okey"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("co"))
        .write.mode("overwrite").parquet(s"$work/co")
    }
    (s.read.parquet(s"$work/items"), s.read.parquet(s"$work/co"))
  }

  def oracleSql: Map[String, String] = Map(

    "q195_mips_prune" ->
      """WITH x AS (SELECT vec_id,
        |             list_transform(CAST(embedding AS DOUBLE[]),
        |               v -> CAST(round(v * 1000000) AS BIGINT)) AS x6
        |           FROM embeddings),
        |n AS (SELECT vec_id, x6,
        |        CAST(list_sum(list_transform(x6, v -> v * v)) AS BIGINT) AS vv
        |      FROM x),
        |q AS (SELECT x6 AS q6, vv AS qq FROM n WHERE vec_id = 0),
        |d AS (SELECT vec_id, vv, qq,
        |        CAST(list_sum(list_transform(range(1, len(x6) + 1),
        |          i -> x6[i] * q6[i])) AS BIGINT) AS dot
        |      FROM n, q WHERE vec_id != 0),
        |k AS (SELECT MIN(dot) AS dot_k FROM (
        |        SELECT dot FROM d ORDER BY dot DESC LIMIT 10))
        |SELECT COUNT(*) AS n_vectors, MIN(dot_k) AS dot_k,
        |       CAST(SUM(CASE WHEN CAST(qq AS HUGEINT) * vv <
        |                          CAST(dot_k AS HUGEINT) * dot_k
        |                      AND dot_k > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_prunable,
        |       CAST(SUM(CASE WHEN CAST(qq AS HUGEINT) * vv <
        |                          CAST(dot_k AS HUGEINT) * dot_k
        |                      AND dot_k > 0 THEN 1 ELSE 0 END)
        |            * 10000 // COUNT(*) AS BIGINT) AS prunable_e4
        |FROM d, k""".stripMargin,

    "q196_schema_evolution" ->
      """SELECT CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |         AS generation,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_with_price,
        |       CAST(SUM(CASE WHEN o_orderkey % 2 = 1
        |                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS sum_price2
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q197_blocking_quality" -> {
      val q144 = IndexQueries.oracleSql("q144_prefix_filter_join")
      val q151 = IndexQueries.oracleSql("q151_simkey_blocking")
      s"""WITH e AS MATERIALIZED (SELECT doc_a, doc_b FROM ($q144)),
         |a AS MATERIALIZED (SELECT doc_a, doc_b FROM ($q151)),
         |ne AS (SELECT COUNT(*) AS n_exact FROM e),
         |na AS (SELECT COUNT(*) AS n_approx FROM a),
         |nc AS (SELECT COUNT(*) AS n_common FROM e
         |       WHERE EXISTS (SELECT 1 FROM a
         |                     WHERE a.doc_a = e.doc_a AND a.doc_b = e.doc_b))
         |SELECT n_exact, n_approx, n_common,
         |       CAST(n_common * 10000 // n_approx AS BIGINT) AS precision_e4,
         |       CAST(n_common * 10000 // n_exact AS BIGINT) AS recall_e4
         |FROM ne, na, nc""".stripMargin
    },

    "q198_basket_affinity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |               FROM lineitem),
        |no AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
        |pf AS (SELECT pk, COUNT(*) AS pn FROM items GROUP BY pk),
        |pairs AS (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS co
        |          FROM items a JOIN items b
        |            ON b.okey = a.okey AND b.pk > a.pk
        |          GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT pa, pb, co,
        |       CAST(na.pn AS BIGINT) AS na, CAST(nb.pn AS BIGINT) AS nb,
        |       CAST((CAST(co AS HUGEINT) * n_orders * 10000) //
        |            (CAST(na.pn AS HUGEINT) * nb.pn) AS BIGINT) AS lift_e4
        |FROM pairs
        |JOIN pf na ON na.pk = pa
        |JOIN pf nb ON nb.pk = pb
        |CROSS JOIN no
        |ORDER BY lift_e4 DESC, pa, pb LIMIT 20""".stripMargin,

    "q199_json_roundtrip" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue2
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
