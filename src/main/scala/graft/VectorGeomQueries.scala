package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.planeSigns

/** Embedding-geometry audits (round 10, twenty-ninth wave): Matryoshka
  * prefix-dimension recall, Johnson-Lindenstrauss distortion of a ±1
  * random projection, per-label norm profiling, and simplified
  * silhouette scores against hash-seeded centroids.
  *
  * Reference intent: the reference stores no embeddings at all; these
  * are the geometry checks an embedding platform runs before committing
  * to a cheaper representation — truncate dimensions (Kusupati 2022
  * Matryoshka), project (JL lemma / Achlioptas ±1), or cluster. All in
  * the house v6 integer-coordinate discipline (round(x·1e6) longs), so
  * every distance is an exact BIGINT/DECIMAL and both engines agree
  * bit-for-bit; probe counts are FIXED so corpus growth only widens the
  * embarrassingly-parallel scan.
  */
object VectorGeomQueries {

  private val DIMS = 64
  private val PREFIX = 16
  private val PLANES = 8

  /** Spark-side v6 integer coordinate array. */
  private val v6Expr =
    "transform(cast(embedding as array<double>), x -> cast(round(x * 1000000) as bigint))"
  /** DuckDB mirror. */
  private val v6Sql =
    "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * 1000000) AS BIGINT))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G236: Matryoshka prefix-dimension recall audit ─────────────────
    // Can the first 16 of 64 dimensions carry nearest-neighbor search?
    // For 10 hash-picked probes: exact top-5 by full-dimension L2² vs
    // top-5 by prefix L2², overlap@5, plus where the TRUE nearest
    // neighbor lands in the prefix ranking (its exact rank, from one
    // count-smaller aggregate — no global per-row rank materializes).
    // Both distance sets come from ONE posexplode join with two
    // conditional sums; the corpus contributes a single probe-bounded
    // scan (10·|V| pairs), the q245 shape.
    "q291_matryoshka_recall" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(expr(v6Expr)).as(Seq("p", "v6")))
      val probeIds = Tables.embeddings(s, dir)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(10)
        .select(col("vec_id").as("q_id"))
      val probes = probeIds.join(x.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("v6", "q6"), Seq("q_id"))
      val d2 = probes.join(x.withColumnRenamed("vec_id", "n_id"), Seq("p"))
        .filter(col("q_id") =!= col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(sum(expr("(q6 - v6) * (q6 - v6)")).as("d2_full"),
          sum(expr(s"case when p < $PREFIX then (q6 - v6) * (q6 - v6) else 0 end"))
            .as("d2_pre"))
      val wf = Window.partitionBy("q_id").orderBy(col("d2_full").asc, col("n_id").asc)
      val wp = Window.partitionBy("q_id").orderBy(col("d2_pre").asc, col("n_id").asc)
      val top5f = d2.withColumn("rk", row_number().over(wf)).filter(col("rk") <= 5)
      val top5p = d2.withColumn("rk", row_number().over(wp)).filter(col("rk") <= 5)
      val overlap = top5f.select("q_id", "n_id")
        .join(top5p.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("overlap5"))
      val nn = top5f.filter(col("rk") === 1)
        .select(col("q_id"), col("n_id").as("nn_id"), col("d2_pre").as("dp_nn"))
      val nnRank = nn.join(d2, Seq("q_id"))
        .groupBy(col("q_id"), col("nn_id"))
        .agg((sum(expr(
          """case when d2_pre < dp_nn or (d2_pre = dp_nn and n_id < nn_id)
            |then 1 else 0 end""".stripMargin)) + 1).as("nn_prefix_rank"))
      nnRank.join(overlap, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("overlap5"), lit(0L)).as("overlap5"),
          col("nn_id"), col("nn_prefix_rank"))
        .orderBy("q_id")
    }),

    // ── G237: Johnson-Lindenstrauss distortion audit (±1 projection) ───
    // Project 64 → 8 dims with the deterministic ±1 planes the SRP-LSH
    // already uses (plan-time md5 sign literals, shared verbatim with
    // DuckDB); for the C(20,2) probe pairs, distortion = ‖Pa−Pb‖² /
    // (8·‖a−b‖²) — expectation exactly 1 under E[P] — reported as an
    // e4 histogram (0.25-wide buckets) with per-bucket min/max. The
    // numerator product outruns BIGINT, so it runs in DECIMAL(38,0)
    // (DuckDB HUGEINT mirrors). Probe work is fixed; the corpus only
    // feeds the 20-row TakeOrdered.
    "q292_jl_distortion" -> ((s, dir) => {
      val projCols = (0 until PLANES).map { p =>
        val signs = planeSigns(p, DIMS).mkString(",")
        expr(s"""aggregate(zip_with(v6, array($signs), (x, s) -> x * s),
                 cast(0 as bigint), (a, x) -> a + x)""").as(s"pr$p")
      }
      val probes = Tables.embeddings(s, dir)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(20)
        .select(col("vec_id"), expr(v6Expr).as("v6"))
        .select(col("vec_id") +: col("v6") +: projCols: _*)
      val a = probes.toDF(probes.columns.map(_ + "_a"): _*)
      val b = probes.toDF(probes.columns.map(_ + "_b"): _*)
      val prTerm = (0 until PLANES)
        .map(p => s"(pr${p}_a - pr${p}_b) * (pr${p}_a - pr${p}_b)").mkString(" + ")
      val pairs = a.crossJoin(b).filter(col("vec_id_a") < col("vec_id_b"))
        .withColumn("d2_orig", expr(
          "aggregate(zip_with(v6_a, v6_b, (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (a, x) -> a + x)"))
        .withColumn("d2_proj", expr(prTerm))
        .withColumn("dist_e4", expr(
          s"cast(cast(d2_proj as decimal(38,0)) * 10000 div ($PLANES * cast(d2_orig as decimal(38,0))) as bigint)"))
      pairs.groupBy(expr("dist_e4 div 2500").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min("dist_e4").as("min_e4"), max("dist_e4").as("max_e4"))
        .orderBy("bucket")
    }),

    // ── G238: per-label norm profile (embedding-health telemetry) ──────
    // ‖v‖² in exact e12 integers per vector, aggregated per label:
    // min/max/floored mean, plus the count of vectors whose norm²
    // exceeds 2× the label mean (the broken-row detector — a vector
    // with double the energy of its class is a pipeline bug, not
    // data). Two aggregates (moment pass + join-back outlier pass),
    // both map-side combined.
    "q293_norm_profile" -> ((s, dir) => {
      val n2 = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          expr(s"aggregate(transform($v6Expr, x -> x * x), cast(0 as bigint), (a, x) -> a + x)")
            .as("n2_e12"))
      val stats = n2.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), min("n2_e12").as("min_e12"),
          max("n2_e12").as("max_e12"),
          // decimal sum: Σ norm² outruns BIGINT past ~3e4 vectors/label
          expr("sum(cast(n2_e12 as decimal(38,0))) div count(1)").as("mean_e12"))
      n2.join(stats, Seq("label"))
        .groupBy("label", "n_vecs", "min_e12", "max_e12", "mean_e12")
        .agg(sum(expr("case when n2_e12 > 2 * mean_e12 then 1 else 0 end")).as("n_outliers"))
        .orderBy("label")
    }),

    // ── G239: simplified silhouette vs hash-seeded centroids ───────────
    // Cluster-separability telemetry: 8 hash-picked seed vectors act as
    // centroids (the q132 seeding discipline); every vector computes
    // exact L2² to all 8 (8·|V| probe-bounded work), a = nearest, b =
    // second nearest via one partitioned window pass, s = (b−a)/max(a,b)
    // at e4. Per-cluster mean silhouette + size: a cluster whose mean
    // s ≈ 0 is not separable at this seeding and a k-means restart
    // (q132) won't fix it — the audit that picks k before Lloyd burns
    // a full pass.
    "q294_silhouette" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(expr(v6Expr)).as(Seq("p", "v6")))
      val seeds = Tables.embeddings(s, dir)
        .orderBy(md5(concat(lit("seed"), col("vec_id").cast("string"))), col("vec_id"))
        .limit(8)
        .select(col("vec_id").as("c_id"))
      val cvec = seeds.join(x.withColumnRenamed("vec_id", "c_id")
        .withColumnRenamed("v6", "c6"), Seq("c_id"))
      val d2 = x.join(cvec.withColumnRenamed("p", "p2"), col("p") === col("p2"))
        .groupBy("vec_id", "c_id")
        .agg(sum(expr("(v6 - c6) * (v6 - c6)")).as("d2"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("c_id").asc)
      val ab = d2.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .groupBy("vec_id")
        .agg(min(when(col("rk") === 1, col("c_id"))).as("cluster"),
          min(when(col("rk") === 1, col("d2"))).as("a2"),
          min(when(col("rk") === 2, col("d2"))).as("b2"))
        .withColumn("s_e4", expr("(b2 - a2) * 10000 div greatest(b2, a2, 1)"))
      ab.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(s_e4) div count(1)").as("mean_s_e4"),
          min("s_e4").as("min_s_e4"))
        .orderBy("cluster")
    })
  )

  def oracleSql: Map[String, String] = {
    val projTermsSql = (side: String) => (0 until PLANES).map { p =>
      val signs = planeSigns(p, DIMS).mkString("[", ",", "]")
      s"list_sum(list_transform(range(1, ${DIMS + 1}), i -> $side[i] * ($signs)[i]))"
    }
    Map(

      "q291_matryoshka_recall" ->
        s"""WITH e AS (SELECT vec_id, $v6Sql AS v FROM embeddings),
           |pr AS (SELECT vec_id AS q_id, v AS qv FROM e
           |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10),
           |d2 AS (SELECT q_id, e.vec_id AS n_id,
           |         list_sum(list_transform(range(1, ${DIMS + 1}),
           |           i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS d2_full,
           |         list_sum(list_transform(range(1, ${PREFIX + 1}),
           |           i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS d2_pre
           |       FROM pr JOIN e ON e.vec_id != q_id),
           |tf AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY d2_full, n_id) AS rk FROM d2),
           |tp AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY d2_pre, n_id) AS rk FROM d2),
           |ov AS (SELECT tf.q_id, COUNT(*) AS overlap5
           |       FROM tf JOIN tp ON tf.q_id = tp.q_id AND tf.n_id = tp.n_id
           |       WHERE tf.rk <= 5 AND tp.rk <= 5 GROUP BY tf.q_id),
           |nn AS (SELECT q_id, n_id AS nn_id, d2_pre AS dp_nn FROM tf WHERE rk = 1),
           |nr AS (SELECT nn.q_id, nn.nn_id,
           |         1 + SUM(CASE WHEN d2.d2_pre < nn.dp_nn
           |                   OR (d2.d2_pre = nn.dp_nn AND d2.n_id < nn.nn_id)
           |                 THEN 1 ELSE 0 END) AS nn_prefix_rank
           |       FROM nn JOIN d2 ON d2.q_id = nn.q_id
           |       GROUP BY nn.q_id, nn.nn_id)
           |SELECT nr.q_id, CAST(COALESCE(overlap5, 0) AS BIGINT) AS overlap5, nn_id,
           |       CAST(nn_prefix_rank AS BIGINT) AS nn_prefix_rank
           |FROM nr LEFT JOIN ov ON ov.q_id = nr.q_id
           |ORDER BY nr.q_id""".stripMargin,

      "q292_jl_distortion" -> {
        val prA = projTermsSql("va").zipWithIndex
          .map { case (t, p) => s"$t AS pra$p" }.mkString(", ")
        val prB = projTermsSql("vb").zipWithIndex
          .map { case (t, p) => s"$t AS prb$p" }.mkString(", ")
        val prTerm = (0 until PLANES)
          .map(p => s"(pra$p - prb$p) * (pra$p - prb$p)").mkString(" + ")
        s"""WITH pr AS (SELECT vec_id, $v6Sql AS v FROM embeddings
           |            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 20),
           |pp AS (SELECT a.vec_id AS ida, b.vec_id AS idb, a.v AS va, b.v AS vb
           |       FROM pr a JOIN pr b ON a.vec_id < b.vec_id),
           |pj AS (SELECT ida, idb, va, vb, $prA, $prB FROM pp),
           |dd AS (SELECT ida, idb,
           |         list_sum(list_transform(range(1, ${DIMS + 1}),
           |           i -> (va[i] - vb[i]) * (va[i] - vb[i]))) AS d2_orig,
           |         $prTerm AS d2_proj
           |       FROM pj),
           |dist AS (SELECT CAST(CAST(d2_proj AS HUGEINT) * 10000
           |                 // ($PLANES * CAST(d2_orig AS HUGEINT)) AS BIGINT) AS dist_e4
           |         FROM dd)
           |SELECT dist_e4 // 2500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |       CAST(MIN(dist_e4) AS BIGINT) AS min_e4,
           |       CAST(MAX(dist_e4) AS BIGINT) AS max_e4
           |FROM dist GROUP BY 1 ORDER BY bucket""".stripMargin
      },

      "q293_norm_profile" ->
        s"""WITH n2 AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
           |    list_sum(list_transform($v6Sql, x -> x * x)) AS n2_e12
           |  FROM embeddings),
           |st AS (SELECT label, COUNT(*) AS n_vecs, MIN(n2_e12) AS min_e12,
           |              MAX(n2_e12) AS max_e12,
           |              SUM(n2_e12) // COUNT(*) AS mean_e12
           |       FROM n2 GROUP BY label)
           |SELECT st.label, CAST(n_vecs AS BIGINT) AS n_vecs,
           |       CAST(min_e12 AS BIGINT) AS min_e12,
           |       CAST(max_e12 AS BIGINT) AS max_e12,
           |       CAST(mean_e12 AS BIGINT) AS mean_e12,
           |       CAST(SUM(CASE WHEN n2.n2_e12 > 2 * st.mean_e12 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
           |FROM st JOIN n2 USING (label)
           |GROUP BY st.label, n_vecs, min_e12, max_e12, mean_e12
           |ORDER BY st.label""".stripMargin,

      "q294_silhouette" ->
        s"""WITH e AS (SELECT vec_id, $v6Sql AS v FROM embeddings),
           |seeds AS (SELECT vec_id AS c_id, v AS cv FROM e
           |          ORDER BY md5('seed' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
           |d2 AS (SELECT e.vec_id, c_id,
           |         list_sum(list_transform(range(1, ${DIMS + 1}),
           |           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS d2
           |       FROM e CROSS JOIN seeds),
           |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
           |         ORDER BY d2, c_id) AS rk FROM d2),
           |ab AS (SELECT vec_id,
           |         MIN(CASE WHEN rk = 1 THEN c_id END) AS cluster,
           |         MIN(CASE WHEN rk = 1 THEN d2 END) AS a2,
           |         MIN(CASE WHEN rk = 2 THEN d2 END) AS b2
           |       FROM rk WHERE rk <= 2 GROUP BY vec_id),
           |s AS (SELECT cluster, (b2 - a2) * 10000 // GREATEST(b2, a2, 1) AS s_e4
           |      FROM ab)
           |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           |       CAST(SUM(s_e4) // COUNT(*) AS BIGINT) AS mean_s_e4,
           |       CAST(MIN(s_e4) AS BIGINT) AS min_s_e4
           |FROM s GROUP BY cluster ORDER BY cluster""".stripMargin
    )
  }
}
