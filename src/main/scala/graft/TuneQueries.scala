package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tuning and experimental-design operators (round 9, twenty-third
  * wave): dominant-period detection, the LSH (b, r) tuning table, and
  * a stratified k-fold manifest.
  *
  * Reference intent: the reference hard-codes weekly seasonality,
  * fixed LSH-free dedup, and a single train/test split
  * (services/training-service/app/train_utils.py:24-35,94-114); at
  * scale the pipeline measures
  * its own period, chooses its banding from the collision economics,
  * and cuts k rotated folds with exact stratum balance. Exact
  * integers throughout.
  */
object TuneQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── G206: dominant-period detection (integer ACF argmax) ───────────
    // q166 reads lag-1; the seasonality DECISION needs argmax over
    // lags 1..14 of the autocovariance Σ(x_t−x̄)(x_{t+k}−x̄). All lags
    // share the same mean, so the numerators compare directly as exact
    // DECIMALs — no per-lag normalization, no floats. Computed from
    // ONE daily-cell table self-joined on (type, day+k) — 14 narrow
    // lag columns via a range join on the day index; argmax with
    // smaller-lag tiebreak via min_by. Emits the winning period, its
    // numerator, and the lag-7 numerator (the calendar hypothesis) so
    // the answer carries its own evidence.
    "q261_period_detect" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("t", expr("datediff(day, date '1970-01-01')").cast(LongType))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val centered = daily.join(broadcast(stats), "event_type")
        // center via cross-multiplication: c = x·n − Σx (exact, shared mean)
        .withColumn("c", expr("x * n - sx"))
        .select("event_type", "t", "c")
      val lags = s.range(1, 15).select(col("id").as("k"))
      val acf = centered.crossJoin(broadcast(lags))
        .withColumn("t2", col("t") + col("k"))
        .join(centered.select(col("event_type"), col("t").as("t2"), col("c").as("c2")),
          Seq("event_type", "t2"))
        .groupBy("event_type", "k")
        .agg(sum(expr("cast(c as decimal(38,0)) * c2")).as("num"),
          count(lit(1)).as("n_pairs"))
      acf.groupBy("event_type")
        .agg(min_by(struct(col("k"), col("num"), col("n_pairs")),
          struct(-col("num"), col("k"))).as("best"),
          max(when(col("k") === 7, col("num"))).as("num_lag7"))
        .select(col("event_type"), col("best.k").as("best_period"),
          col("best.num").as("best_num"), col("best.n_pairs").as("n_pairs"),
          col("num_lag7"))
        .orderBy("event_type")
    }),

    // ── G207: LSH banding tuning table (collision economics) ───────────
    // Choosing (bands b, rows r) is THE MinHash engineering decision.
    // For r ∈ {1, 2, 4} over the landed 8-hash signatures (b = 8/r):
    // the MEASURED distinct candidate-pair count from banding the real
    // corpus, next to the THEORETICAL catch probability at J = 19/20 —
    // 1 − (1 − (19/20)^r)^b, an exact rational scaled e6 (numerator
    // (20^r − 19^r)^b, denominator 20^(rb), all inside BIGINT for
    // rb = 8). Each config is one band-key groupBy over the signature
    // snapshot, pair mass from Σ m·(m−1)/2 per bucket — never
    // materializing the pairs. The three-row table is the tuning
    // curve: candidates you pay vs recall you buy.
    "q262_lsh_tuning" -> ((s, dir) => {
      val sigs = TextQueries.sigTable(s, dir)
      // ALL 14 (config, band) keys explode from each signature row in
      // one projection, so the whole sweep is ONE groupBy + one 3-row
      // re-aggregate — not 14 separate aggregates (the first cut
      // scheduled 14 tiny jobs and paid ~0.2 s overhead each)
      val keyStructs = Seq(1, 2, 4).flatMap { r =>
        val b = 8 / r
        (0 until b).map { bi =>
          struct(lit(r.toLong).as("r"), lit(bi.toLong).as("bi"),
            concat_ws("_", (0 until r).map(ri => col(s"s${bi * r + ri}")): _*).as("key"))
        }
      }
      val mass = sigs
        .select(explode(array(keyStructs: _*)).as("e"))
        .select(col("e.r").as("r"), col("e.bi").as("bi"), col("e.key").as("key"))
        .groupBy("r", "bi", "key").agg(count(lit(1)).as("m"))
        .groupBy("r").agg(sum(expr("m * (m - 1) div 2")).as("cand_mass"))
      def theory(r: Int): (Long, Long) = {
        val b = 8 / r
        val p20r = math.pow(20, r).toLong; val p19r = math.pow(19, r).toLong
        val num = BigInt(p20r - p19r).pow(b); val den = BigInt(20).pow(r * b)
        (b.toLong, 1000000L - (BigInt(1000000) * num / den).toLong)
      }
      val th = s.createDataFrame(Seq(1L, 2L, 4L).map { r =>
        val (b, p) = theory(r.toInt); (r, b, p)
      }).toDF("r", "b", "p_catch_e6")
      mass.join(broadcast(th), "r")
        .select("r", "b", "cand_mass", "p_catch_e6")
        .orderBy("r")
    }),

    // ── G208: stratified k-fold manifest (rotated exact folds) ─────────
    // q145 cuts ONE split; cross-validation needs k folds with every
    // stratum split |n/k|±1 exactly. Deterministic: rank docs within
    // their stratum (lang) by md5 order, fold = rank mod 5. The
    // manifest emits per (lang, fold) counts and the min/max spread —
    // the ±1 guarantee AS DATA (spec asserts it). One rank window per
    // stratum + one census aggregate; at 100 TB the manifest is what
    // the training job mounts, not a copy of the corpus.
    "q263_kfold_manifest" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(expr("md5(cast(doc_id as string))"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("fold", (row_number().over(w) % 5).cast(LongType))
        .groupBy("lang", "fold")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("spread", expr(
          "max(n_docs) over (partition by lang) - min(n_docs) over (partition by lang)"))
        .orderBy("lang", "fold")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q261_period_detect" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |               FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, CAST(day - DATE '1970-01-01' AS BIGINT) AS t, x
        |       FROM daily),
        |st AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx FROM d2 GROUP BY 1),
        |c AS (SELECT d2.event_type, d2.t, d2.x * st.n - st.sx AS c
        |      FROM d2 JOIN st USING (event_type)),
        |acf AS (SELECT a.event_type, k.k,
        |          SUM(CAST(a.c AS HUGEINT) * b.c) AS num, COUNT(*) AS n_pairs
        |        FROM c a
        |        CROSS JOIN (SELECT UNNEST(range(1, 15)) AS k) k
        |        JOIN c b ON b.event_type = a.event_type AND b.t = a.t + k.k
        |        GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY num DESC, k ASC) AS rn FROM acf),
        |l7 AS (SELECT event_type, num AS num_lag7 FROM acf WHERE k = 7)
        |SELECT r.event_type, CAST(r.k AS BIGINT) AS best_period,
        |       CAST(r.num AS DECIMAL(38,0)) AS best_num,
        |       CAST(r.n_pairs AS BIGINT) AS n_pairs,
        |       CAST(l7.num_lag7 AS DECIMAL(38,0)) AS num_lag7
        |FROM r JOIN l7 USING (event_type)
        |WHERE r.rn = 1 ORDER BY r.event_type""".stripMargin,

    "q262_lsh_tuning" -> {
      def cfg(r: Int): String = {
        val b = 8 / r
        val bands = (0 until b).map { bi =>
          val key = (0 until r).map(ri => s"CAST(s${bi * r + ri} AS VARCHAR)")
            .mkString(" || '_' || ")
          s"SELECT $key AS band FROM sigs"
        }.mkString(" UNION ALL ")
        val p20r = math.pow(20, r).toLong; val p19r = math.pow(19, r).toLong
        val num = BigInt(p20r - p19r).pow(b); val den = BigInt(20).pow(r * b)
        val pE6 = 1000000L - (BigInt(1000000) * num / den).toLong
        s"""SELECT CAST($r AS BIGINT) AS r, CAST($b AS BIGINT) AS b,
           |  (SELECT CAST(COALESCE(SUM(m * (m - 1) // 2), 0) AS BIGINT)
           |   FROM (SELECT band, COUNT(*) AS m FROM ($bands) GROUP BY band))
           |  AS cand_mass,
           |  CAST($pE6 AS BIGINT) AS p_catch_e6""".stripMargin
      }
      // TextQueries.sigCte is the SQL mirror of withSignatures — the
      // exact signature formula the landed snapshot used
      s"""${TextQueries.sigCte}
         |${cfg(1)} UNION ALL ${cfg(2)} UNION ALL ${cfg(4)}
         |ORDER BY r""".stripMargin
    },

    "q263_kfold_manifest" ->
      """WITH f AS (SELECT lang,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR))) % 5 AS BIGINT) AS fold
        |           FROM documents),
        |c AS (SELECT lang, fold, COUNT(*) AS n_docs FROM f GROUP BY 1, 2)
        |SELECT lang, fold, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(MAX(n_docs) OVER (PARTITION BY lang)
        |            - MIN(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS spread
        |FROM c ORDER BY lang, fold""".stripMargin
  )
}
