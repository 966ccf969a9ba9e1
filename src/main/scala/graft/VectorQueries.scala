package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exactness baseline, LSH-banded
  * near-dup pairing, and a sign-random-projection bucketed ANN — the
  * 100-TB scale path (bucket equi-joins instead of all-pairs joins).
  *
  * Cosines are rounded to 6 decimals before ranking so both engines rank
  * identical values (per-element IEEE ops match; only final-ulp
  * accumulation noise differs). LSH bucket bits use scaled-BIGINT
  * projections — exact in any engine, no float-order risk on sign tests.
  */
object VectorQueries {

  /** Embedding dimensionality of the testdata (constant across SFs); the
    * hyperplane sign literals are sized to it at plan-build time. */
  private val Dims = 64
  private val AnnPlanes = 0 until 8   // q28: one 8-bit bucket (256 buckets)
  // q27: 4 bands × 8 planes → 256 buckets per (label, band). Round 3 used
  // 2 bands × 4 planes = 16 buckets, so within one label each bucket held
  // ~n/16 vectors and the candidate self-join grew as n²/16 per band — a
  // pair explosion at 10⁹ vectors. 8-plane bands shrink expected bucket
  // occupancy 16×; the recall a narrower bucket loses is bought back with
  // twice the bands (LSH AND-OR amplification: planes AND within a band,
  // bands OR across).
  private val NdBands: Seq[Range] = (0 until 4).map(g => (8 * g) until (8 * g + 8))
  private val IvfSeeds = 8            // q38: coarse-quantizer cell count
  private val KmeansCells = 8         // q132: Lloyd-step centroid count (seeds = vec_id 0..7)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G62: int8 embedding quantization manifest ──────────────────────
    // Scalar symmetric quantization (the 4× memory cut every billion-
    // vector ANN index takes before sharding): per-vector scale m =
    // max|x|, q = round(127·x/m), manifest = (scale, Σq, Σq², saturated
    // dims). EXACT across engines: coordinates reduce to e6 ints at the
    // scan, and the quantizer is the integer ladder sign(v)·((254·|v| +
    // m) div 2m) — round-half-away with no float division to land near
    // a .5 boundary differently per engine. The whole op is array HOFs
    // (transform/aggregate) inside ONE projection — zero shuffle, no
    // explode fan-out, embarrassingly parallel at any vector count; only
    // the final presentation sort exchanges.
    "q117_int8_quantize" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .select(col("vec_id"),
          expr("transform(v, x -> cast(round(x * 1000000) as bigint))").as("x6"))
        .withColumn("m6", expr("array_max(transform(x6, v -> abs(v)))"))
        .withColumn("qs", expr(
          """transform(x6, v -> CASE WHEN m6 = 0 THEN 0L
            | ELSE cast(sign(v) as bigint) * ((abs(v) * 254 + m6) div (2 * m6))
            | END)""".stripMargin))
        .select(col("vec_id"), col("m6"),
          expr("aggregate(qs, 0L, (a, b) -> a + b)").as("sum_q"),
          expr("aggregate(qs, 0L, (a, b) -> a + b * b)").as("sum_q2"),
          expr("aggregate(qs, 0L, (a, b) -> a + IF(abs(b) = 127, 1L, 0L))").as("n_sat"))
        .orderBy("vec_id")
    }),

    // Brute-force cosine top-k for one query vector (vec_id 0): the
    // correctness baseline every ANN variant is judged against. The query
    // vector is broadcast; the scan stays embarrassingly parallel.
    "q26_ann_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qe"))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), asDouble(col("embedding")).as("ve"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosineR6(col("ve"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(5)
    }),

    // Near-duplicate pairs. Round 1 joined all pairs within each label —
    // O(n²) per label, 36 s at sf0.1 and a scale-killer. Now candidates
    // come from a 4-band × 8-plane SRP-LSH equi-join on (label, band,
    // bucket), then cosine-verify candidates only; top-10 most similar.
    "q27_embedding_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select((Seq(col("vec_id"), col("label"), asDouble(col("embedding")).as("v")) ++
          NdBands.zipWithIndex.map { case (r, g) =>
            lshBucket(asDouble(col("embedding")), r, Dims).as(s"b$g") }): _*)
      val bands = e.select(col("vec_id"), col("label"),
        posexplode(array(NdBands.indices.map(g => col(s"b$g")): _*))
          .as(Seq("band_id", "bucket")))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.label") === col("y.label") && col("x.band_id") === col("y.band_id")
            && col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
        .distinct()
      val vecs = e.select(col("vec_id"), col("v"))
      cand
        .join(vecs.select(col("vec_id").as("vec_a"), col("v").as("va")), Seq("vec_a"))
        .join(vecs.select(col("vec_id").as("vec_b"), col("v").as("vb")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"), cosineR6(col("va"), col("vb")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_a"), col("vec_b"))
        .limit(10)
    }),

    // IVF-style ANN (the other scale path): coarse-quantize every vector
    // to its nearest of K deterministic seed centroids (vec_id 1..K —
    // engine-defined but oracle-reproducible), then probe only the
    // query's cell. Assignment is a linear broadcast pass (n×K cosines);
    // the probe touches ~1/K of the corpus — the inverted-file shape.
    "q38_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val seeds = e.filter(col("vec_id").between(1, IvfSeeds))
        .select(col("vec_id").as("seed_id"), col("v").as("sv"))
      // argmax by (seed_cos desc, seed_id asc) as a hash aggregate: max_by
      // over struct(seed_cos, -seed_id) partial-aggregates map-side (each
      // vector's K seed rows collapse to one before any shuffle) — the
      // round-3 row_number window sorted every (vector × K) group instead.
      // v rides in the max_by payload so no rejoin against the corpus.
      val cells = e.crossJoin(broadcast(seeds))
        .select(col("vec_id"), col("v"), col("seed_id"),
          cosineR6(col("v"), col("sv")).as("seed_cos"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("seed_id"), col("v")),
          struct(col("seed_cos"), negate(col("seed_id")))).as("w"))
        .select(col("vec_id"), col("w.v").as("v"), col("w.seed_id").as("cell"))
      val q = cells.filter(col("vec_id") === 0)
        .select(col("v").as("qe"), col("cell").as("qcell"))
      cells.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("cell") === col("qcell"))
        .select(col("vec_id"), col("cell"), cosineR6(col("v"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(5)
    }),

    // LSH-bucketed ANN (scale path): deterministic sign-random-projection
    // buckets from plan-time hyperplane literals; search only the query's
    // bucket. Oracle-matched since round 2 (bucket bits are exact
    // scaled-int arithmetic both engines reproduce).
    "q28_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), AnnPlanes, Dims))
      val q = e.filter(col("vec_id") === 0)
        .select(col("v").as("qe"), col("bucket").as("qbucket"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"), cosineR6(col("v"), col("qe")).as("cos_r"))
        .orderBy(col("cos_r").desc, col("vec_id"))
        .limit(5)
    }),

    // ── G87: embedding centroid drift (feature-drift monitor) ──────────
    // Has the embedding distribution moved between two snapshots? Per
    // label, compare the mean vector of the even-id half (snapshot A)
    // against the odd-id half (B): report the summed squared per-dim
    // centroid shift and the worst-shifted dimension. Coordinates
    // reduce to e6 ints at the scan (q132's discipline) and centroid
    // means are floor-divs of BIGINT sums, so every engine agrees
    // exactly — the embedding-space twin of q126/q131's drift monitors.
    // Plan: one (label, side, dim) partial aggregate over the per-dim
    // explode, a (label, dim) pivot via conditional MIN, a |labels|·d
    // compare, and a |labels|-row rollup with a max_by argmax.
    "q142_centroid_drift" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(asDouble(col("embedding"))).as(Seq("p", "e")))
        .select(col("vec_id"), col("label"), (col("p") + 1).cast("long").as("i"),
          (col("vec_id") % 2 === 0).as("a"),
          round(col("e") * 1000000).cast("long").as("v6"))
      val sums = x.groupBy("label", "a", "i")
        .agg(sum(col("v6")).as("sv"), count(lit(1)).as("n"))
      val byDim = sums.groupBy("label", "i")
        .agg(min(when(col("a"), expr("sv div n"))).as("ca6"),
          min(when(!col("a"), expr("sv div n"))).as("cb6"),
          min(when(col("a"), col("n"))).as("na"),
          min(when(!col("a"), col("n"))).as("nb"))
      byDim
        .withColumn("d", col("cb6") - col("ca6"))
        .groupBy("label")
        .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
          sum(col("d") * col("d")).as("shift2_sum"),
          max_by(struct(col("i"), abs(col("d")).as("ad")),
            struct(abs(col("d")), -col("i"))).as("m"))
        .select(col("label").cast("long").as("label"), col("n_a"), col("n_b"),
          col("shift2_sum"), col("m.i").as("top_dim"), col("m.ad").as("top_abs_d"))
        .orderBy("label")
    }),

    // ── G77: k-means Lloyd step (IVF centroid training) ────────────────
    // The training step behind q38's coarse quantizer: assign every
    // vector to its nearest seed centroid (EXACT scaled-int squared L2 —
    // coordinates reduce to e6 ints at the scan, so distances are
    // BIGINT-exact and the argmin is engine-independent; ties break to
    // the lowest centroid id), then emit the re-estimated centroids as
    // per-(cell, dim) floor-div means. Plan shape: the K×d centroid
    // table is broadcast into the per-dim explode, assignment
    // partial-aggregates map-side (each vector's K rows collapse before
    // the vec_id shuffle), and the update aggregate lands on K·d keys —
    // at a billion vectors the explode becomes a fused per-row kernel
    // over the broadcast centroid matrix (SrpKernel's shape) with this
    // same aggregate tail. Overflow: diff ≤ 4e6 ⇒ d·diff² ≤ 10^15·d —
    // BIGINT-safe through d ≈ 9000 dims.
    "q132_kmeans_step" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(asDouble(col("embedding"))).as(Seq("p", "e")))
        .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
          round(col("e") * 1000000).cast("long").as("v6"))
      val cents = x.filter(col("vec_id").between(0, KmeansCells - 1))
        .select(col("vec_id").as("cid"), col("i"), col("v6").as("c6"))
      val assign = x.join(broadcast(cents), Seq("i"))
        .groupBy("vec_id", "cid")
        .agg(sum((col("v6") - col("c6")) * (col("v6") - col("c6"))).as("d2"))
        .groupBy("vec_id")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      assign.join(x, Seq("vec_id"))
        .groupBy("cid", "i")
        .agg(count(lit(1)).as("n_members"), sum(col("v6")).as("sum_v6"))
        .withColumn("new_c6", expr("sum_v6 div n_members"))
        .select("cid", "i", "n_members", "sum_v6", "new_c6")
        .orderBy("cid", "i")
    }),

    // ── G219: per-dimension embedding moments (q274) ───────────────────
    // The whitening/quantization front door: exact mean and population
    // variance per embedding DIMENSION, in scaled integers (coordinates
    // reduce to e6 ints at the scan; moments are BIGINT/DECIMAL(38,0)
    // sums, so the answer is engine-independent — no float accumulation
    // order anywhere). Complements q117 (which calibrates int8 ranges
    // from min/max) and q178 (the full Gram matrix): this is the
    // diagonal, at 1/d the cost. Plan: ONE posexplode scan → d-key
    // aggregate with map-side combine; output is d rows. Mean uses the
    // house sign-explicit floor (coordinate sums can be negative —
    // Spark div truncates toward zero, DuckDB // floors); the variance
    // numerator is ≥ 0 by Cauchy-Schwarz, so plain floor-div is exact.
    "q274_dim_moments" -> ((s, dir) => {
      val x = Tables.embeddings(s, dir)
        .select(posexplode(asDouble(col("embedding"))).as(Seq("p", "e")))
        .select((col("p") + 1).cast("long").as("i"),
          round(col("e") * 1000000).cast("long").as("v6"))
      x.groupBy("i")
        .agg(count(lit(1)).as("n"), sum("v6").as("s6"),
          sum(expr("cast(v6 as decimal(38,0)) * v6")).as("ss12"))
        .withColumn("mean_e6", expr(
          "case when s6 >= 0 then s6 div n else -((-s6) div n) end"))
        .withColumn("var_e12", expr(
          "cast((cast(n as decimal(38,0)) * ss12 - cast(s6 as decimal(38,0)) * s6)" +
            " div (cast(n as decimal(38,0)) * n) as bigint)"))
        .select("i", "n", "s6", "mean_e6", "var_e12")
        .orderBy("i")
    })
  )

  def oracleSql: Map[String, String] = {
    val cosR6 = sqlCosineR6("ve", "qe")
    Map(
      "q117_int8_quantize" ->
        """WITH e AS (SELECT vec_id,
          |             list_transform(CAST(embedding AS DOUBLE[]),
          |               x -> CAST(round(x * 1000000) AS BIGINT)) AS x6
          |           FROM embeddings),
          |     m AS (SELECT vec_id, x6,
          |             list_max(list_transform(x6, v -> abs(v))) AS m6 FROM e),
          |     q AS (SELECT vec_id, m6,
          |             list_transform(x6, v -> CASE WHEN m6 = 0 THEN 0
          |               ELSE CAST(sign(v) AS BIGINT) * ((abs(v) * 254 + m6) // (2 * m6))
          |               END) AS qs
          |           FROM m)
          |SELECT vec_id, m6,
          |       CAST(list_sum(qs) AS BIGINT) AS sum_q,
          |       CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS sum_q2,
          |       CAST(len(list_filter(qs, v -> abs(v) = 127)) AS BIGINT) AS n_sat
          |FROM q ORDER BY vec_id""".stripMargin,

      "q26_ann_bruteforce" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
           |     e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings WHERE vec_id != 0)
           |SELECT vec_id, $cosR6 AS cos_r
           |FROM e, q ORDER BY cos_r DESC, vec_id LIMIT 5""".stripMargin,

      "q27_embedding_neardup" ->
        s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |     b AS (SELECT vec_id, label, v,
           |             ${NdBands.zipWithIndex.map { case (r, g) =>
                            s"${sqlLshBucket("v", r, Dims)} AS b$g" }.mkString(",\n             ")} FROM e),
           |     bands AS (${NdBands.indices.map(g =>
                            s"SELECT vec_id, label, $g AS band_id, b$g AS bucket FROM b")
                            .mkString("\n               UNION ALL ")}),
           |     cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
           |              FROM bands x JOIN bands y
           |                ON x.label = y.label AND x.band_id = y.band_id
           |               AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
           |SELECT vec_a, vec_b, ${sqlCosineR6("a.v", "b.v")} AS cos_r
           |FROM cand JOIN e a ON vec_a = a.vec_id JOIN e b ON vec_b = b.vec_id
           |ORDER BY cos_r DESC, vec_a, vec_b LIMIT 10""".stripMargin,

      "q28_ann_lsh" ->
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |     b AS (SELECT vec_id, v, ${sqlLshBucket("v", AnnPlanes, Dims)} AS bucket FROM e),
           |     q AS (SELECT v AS qe, bucket AS qbucket FROM b WHERE vec_id = 0)
           |SELECT vec_id, bucket, ${sqlCosineR6("v", "qe")} AS cos_r
           |FROM b, q WHERE vec_id != 0 AND bucket = qbucket
           |ORDER BY cos_r DESC, vec_id LIMIT 5""".stripMargin,

      "q38_ann_ivf" ->
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |     seeds AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id BETWEEN 1 AND $IvfSeeds),
           |     asg AS (SELECT vec_id, v, seed_id, ${sqlCosineR6("v", "sv")} AS seed_cos,
           |               row_number() OVER (PARTITION BY vec_id
           |                 ORDER BY ${sqlCosineR6("v", "sv")} DESC, seed_id) AS rn
           |             FROM e CROSS JOIN seeds),
           |     cells AS (SELECT vec_id, v, seed_id AS cell FROM asg WHERE rn = 1),
           |     q AS (SELECT v AS qe, cell AS qcell FROM cells WHERE vec_id = 0)
           |SELECT vec_id, cell, ${sqlCosineR6("v", "qe")} AS cos_r
           |FROM cells, q WHERE vec_id != 0 AND cell = qcell
           |ORDER BY cos_r DESC, vec_id LIMIT 5""".stripMargin,

      "q142_centroid_drift" ->
        """WITH x AS (SELECT vec_id, label,
          |             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
          |             vec_id % 2 = 0 AS a,
          |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v6
          |           FROM embeddings),
          |     s AS (SELECT label, a, i, SUM(v6) AS sv, COUNT(*) AS n
          |           FROM x GROUP BY label, a, i),
          |     d AS (SELECT label, i,
          |             MIN(CASE WHEN a THEN sv // n END) AS ca6,
          |             MIN(CASE WHEN NOT a THEN sv // n END) AS cb6,
          |             MIN(CASE WHEN a THEN n END) AS na,
          |             MIN(CASE WHEN NOT a THEN n END) AS nb
          |           FROM s GROUP BY label, i),
          |     r AS (SELECT label, i, cb6 - ca6 AS dd, na, nb FROM d),
          |     agg AS (SELECT label, MIN(na) AS n_a, MIN(nb) AS n_b,
          |               SUM(dd * dd) AS shift2_sum FROM r GROUP BY label),
          |     top AS (SELECT label, i AS top_dim, abs(dd) AS top_abs_d,
          |               ROW_NUMBER() OVER (PARTITION BY label
          |                 ORDER BY abs(dd) DESC, i ASC) AS rn FROM r)
          |SELECT CAST(agg.label AS BIGINT) AS label,
          |       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          |       CAST(shift2_sum AS BIGINT) AS shift2_sum,
          |       top.top_dim, CAST(top.top_abs_d AS BIGINT) AS top_abs_d
          |FROM agg JOIN top ON agg.label = top.label AND top.rn = 1
          |ORDER BY label""".stripMargin,

      "q132_kmeans_step" ->
        s"""WITH x AS (SELECT vec_id,
           |             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
           |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v6
           |           FROM embeddings),
           |     c AS (SELECT vec_id AS cid, i, v6 AS c6 FROM x
           |           WHERE vec_id BETWEEN 0 AND ${KmeansCells - 1}),
           |     d AS (SELECT x.vec_id, c.cid, SUM((x.v6 - c.c6) * (x.v6 - c.c6)) AS d2
           |           FROM x JOIN c ON x.i = c.i GROUP BY x.vec_id, c.cid),
           |     a AS (SELECT vec_id, cid FROM
           |             (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
           |                ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1),
           |     u AS (SELECT a.cid, x.i, COUNT(*) AS n_members, SUM(x.v6) AS sum_v6
           |           FROM a JOIN x ON a.vec_id = x.vec_id GROUP BY a.cid, x.i)
           |SELECT cid, i, CAST(n_members AS BIGINT) AS n_members,
           |       CAST(sum_v6 AS BIGINT) AS sum_v6,
           |       CAST(sum_v6 // n_members AS BIGINT) AS new_c6
           |FROM u ORDER BY cid, i""".stripMargin,

      "q274_dim_moments" ->
        """WITH x AS (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
          |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v6
          |           FROM embeddings),
          |m AS (SELECT i, COUNT(*) AS n, SUM(v6) AS s6,
          |        SUM(CAST(v6 AS HUGEINT) * v6) AS ss12
          |      FROM x GROUP BY i)
          |SELECT i, CAST(n AS BIGINT) AS n, CAST(s6 AS BIGINT) AS s6,
          |       CAST(CASE WHEN s6 >= 0 THEN s6 // n
          |                 ELSE -((-s6) // n) END AS BIGINT) AS mean_e6,
          |       CAST((CAST(n AS HUGEINT) * ss12 - CAST(s6 AS HUGEINT) * s6)
          |            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_e12
          |FROM m ORDER BY i""".stripMargin
    )
  }
}
