package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.{Forecaster, ModelRegistry}
import graft.ml.Forecaster.{CvMetric, Forecast, Obs}
import graft.ops.Relational.latestPerKey
import graft.store.Store

/** The reference's weekly train+forecast pipeline (SURVEY §3.2, U2-U4,
  * W2, A4-A8) as declared queries over the `events` table: per-key daily
  * series → anchored 5-fold walk-forward CV → closed-form OLS fit →
  * inclusive 7-day forecast → write/dedup/read-back slice.
  *
  * The whole reference DAG (distinct keys → Ray fan-out → HTTP forecast
  * → to_sql append) collapses into groupByKey.flatMapGroups + a parquet
  * append — the Spark-native shape that scales from 5 keys to 10M.
  */
object MlQueries {

  /** Per-key daily series: distributed hash-aggregate first (the heavy
    * part), so flatMapGroups only ever sees one tiny series per key. */
  private def dailySeries(s: SparkSession, dir: String): Dataset[Obs] = {
    import s.implicits._
    Tables.events(s, dir)
      .filter(col("value") > 0)
      .groupBy(col("event_type").as("key"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1000).cast(LongType)).as("y3"))
      .withColumn("x",
        datediff(col("day"), min(col("day")).over(Window.partitionBy("key"))).cast(IntegerType))
      .select("key", "day", "x", "y3")
      .as[Obs]
  }

  private def cvMetricsDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dailySeries(s, dir)
      .groupByKey(_.key)
      .flatMapGroups((k: String, it: Iterator[Obs]) => Forecaster.cvMetrics(k, it))
      .toDF()
  }

  private def forecastDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dailySeries(s, dir)
      .groupByKey(_.key)
      .flatMapGroups((k: String, it: Iterator[Obs]) => Forecaster.forecastKey(k, it))
      .toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // U4/W2/A4-A8 — per-(key, fold) walk-forward CV metric pack.
    "q30_cv_metrics" -> ((s, dir) =>
      cvMetricsDf(s, dir).orderBy("key", "fold")),

    // U2/U3/X9 — per-key fit + inclusive 7-day forecast (8 rows/key).
    "q31_forecast" -> ((s, dir) =>
      forecastDf(s, dir).orderBy("key", "day")),

    // End-to-end slice (SURVEY §7.2, web-ui/app/db_utils.py:32-73):
    // the engine WRITES forecasts twice (two model versions) through the
    // store layer (K5 ensure + K3 append), then reads its own table back
    // and serves latest-per-key (W1 dedup) with the X13 model name —
    // the reference's UI read path over engine-written data. The train+
    // write stage runs once per JVM (fixture memo, like q29's ingest):
    // in production the weekly DAG writes, the UI reads many times.
    "q32_latest_forecasts" -> ((s, dir) => {
      val tbl = PipelineQueries.cachedFixture(s"forecasts|$dir") { work =>
        val tbl = s"$work/forecast_results"
        val fc = forecastDf(s, dir)
        Store.ensureTable(s, tbl, fc.withColumn("model_version", lit(1)).schema)
        Store.append(fc.withColumn("model_version", lit(1)), tbl)
        Store.append(fc.withColumn("model_version", lit(2)), tbl)
      } + "/forecast_results"
      latestPerKey(Store.read(s, tbl), Seq("key", "day"), col("model_version"))
        .withColumn("model_name", concat_ws("-", lit("graft-forecaster"), col("key")))
        .select("key", "day", "yhat3", "lo3", "hi3", "model_name", "model_version")
        .orderBy("key", "day")
    }),

    // Model registry with stage semantics (SURVEY §1.1 ModelMeta;
    // reference train_utils.py:139-149 register + handlers/mlflow.py:
    // 24-40 promote/serve): the training job writes each key's model as
    // name/version rows carrying the pooled integer CV stats, version 1
    // archived (the superseded weekly model), version 2 staged through
    // the RMSE quality gate — production iff pooled rmse ≤ 1000, the
    // reference's guard threshold. The declared query lists the full
    // registry (version history + stage verdicts); the serving path
    // (latest production per name, ModelRegistry.servingVersions) is
    // asserted in RossmannSliceSpec. rmse is derived at read time from
    // the stored exact integers — one sqrt+divide, bit-equal in DuckDB.
    "q77_model_registry" -> ((s, dir) => {
      Store.read(s, modelsTable(s, dir))
        .withColumn("rmse",
          sqrt(col("ssq3").cast(DoubleType) / col("n_test").cast(DoubleType)) / 1000.0)
        .select("model_name", "version", "stage", "n_test", "ssq3", "rmse", "train_end")
        .orderBy("model_name", "version")
    }),

    // Serve-from-registry (VERDICT r5 missing #1; reference
    // handlers/mlflow.py:24-40 + main.py:83-112 LOAD the registered
    // model and predict — they never re-train per request): resolve the
    // serving set (latest production version per name, the quality-gated
    // survivors) and generate the 8-row horizon purely from the STORED
    // coefficients — the events table is never touched. The oracle
    // re-derives the fit from the raw series in DuckDB and gates on the
    // pooled CV stats, so a green hash PROVES stored-coefficient serving
    // is bit-identical to re-fitting. Staging models (gate failures)
    // must not serve — either leak direction hash-fails.
    "q107_registry_serving" -> ((s, dir) => {
      val serving = ModelRegistry.servingVersions(Store.read(s, modelsTable(s, dir)))
      ModelRegistry.forecastFromRegistry(serving)
        .select("model_name", "version", "day", "yhat3", "lo3", "hi3")
        .orderBy("model_name", "day")
    })
  )

  /** The registry fixture shared by q77/q107 (built once per JVM): each
    * key's model as name/version rows carrying BOTH the pooled integer
    * CV stats (the gate evidence) and the fitted serving coefficients
    * ([[Forecaster.ModelCoef]] — what q107 serves from). Version 1 lands
    * archived (the superseded weekly model), version 2 goes through the
    * RMSE quality gate: production iff pooled rmse ≤ [[MaxRmse]], the
    * reference's guard threshold (handlers/mlflow.py:32-40). */
  private def modelsTable(s: SparkSession, dir: String): String =
    PipelineQueries.cachedFixture(s"models|$dir") { work =>
      import s.implicits._
      val t = s"$work/models"
      val pooled = dailySeries(s, dir)
        .groupByKey(_.key)
        .flatMapGroups((k: String, it: Iterator[Obs]) => Forecaster.cvPooled(k, it))
        .toDF()
      val coef = dailySeries(s, dir)
        .groupByKey(_.key)
        .flatMapGroups((k: String, it: Iterator[Obs]) => Forecaster.fitCoef(k, it))
        .toDF()
        .drop("train_end") // same last-observed-day stamp pooled carries
      val full = pooled.join(coef, "key")
      def meta(version: Int, stage: Column) = full.select(
        concat_ws("-", lit("graft-forecaster"), col("key")).as("model_name"),
        lit(version).as("version"), stage.as("stage"),
        col("n_test"), col("ssq3"), col("train_end"),
        col("slope"), col("intercept").as("icept"), col("sdow"),
        col("ci3"), col("maxx"))
      val v1 = meta(1, lit(ModelRegistry.Archived))
      val v2 = meta(2,
        ModelRegistry.gateStage(col("ssq3"), col("n_test"), MaxRmse))
      Store.ensureTable(s, t, v1.schema)
      ModelRegistry.register(v1, t)
      ModelRegistry.register(v2, t)
    } + "/models"

  /** The reference's model-quality guard threshold
    * (handlers/mlflow.py:32-40: reject RMSE > 1000). */
  val MaxRmse = 1000L

  // ---------------------------------------------------------------- oracles

  /** Shared CTE: per-key daily series with day index (mirror of
    * [[dailySeries]]). */
  private val seriesCte =
    """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
      |                      SUM(CAST(round(value*1000) AS BIGINT)) AS y3
      |               FROM events WHERE value > 0 GROUP BY 1, 2),
      |base AS (SELECT key, day, y3,
      |                CAST(date_diff('day', MIN(day) OVER (PARTITION BY key), day) AS INT) AS x
      |         FROM daily)""".stripMargin

  /** OLS sufficient statistics + slope/intercept, mirroring
    * [[Forecaster.ols]]'s exact double op sequence. */
  private def fitCte(src: String, keyCols: String, nCol: String) =
    s"""s1 AS (SELECT *, CAST($nCol*sxy - sx*sy AS DOUBLE) / CAST($nCol*sxx - sx*sx AS DOUBLE) AS slope
       |       FROM $src WHERE $nCol >= 2),
       |s2 AS (SELECT *, (CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE)) / CAST($nCol AS DOUBLE) AS icept
       |       FROM s1)""".stripMargin

  /** Seasonal stage mirror of [[Forecaster.fitSeasonal]]: per-dow mean of
    * the INTEGER trend residuals; `$src` must expose slope/icept keyed by
    * `$keys`, `$rows` the observation rows (key cols + x, y3, day). */
  private def seasonCte(rows: String, keys: String, extraPred: String) =
    s"""sd AS (SELECT ${keys.split(",").map(k => s"b.$k").mkString(", ")}, isodow(b.day) AS dw,
       |              SUM(b.y3 - CAST(round(icept + slope*CAST(b.x AS DOUBLE)) AS BIGINT)) AS ssum,
       |              COUNT(*) AS scnt
       |       FROM $rows b JOIN s2 ON ${keys.split(",").map(k => s"b.$k = s2.$k").mkString(" AND ")}$extraPred
       |       GROUP BY ALL),
       |sf AS (SELECT *, CAST(ssum AS DOUBLE)/CAST(scnt AS DOUBLE) AS sdow FROM sd)""".stripMargin

  private val forecastSql =
    s"""$seriesCte,
       |st AS (SELECT key, COUNT(*) AS n, SUM(x) AS sx, SUM(y3) AS sy,
       |              SUM(CAST(x AS BIGINT)*x) AS sxx, SUM(CAST(x AS BIGINT)*y3) AS sxy,
       |              MAX(day) AS maxd, MAX(x) AS maxx
       |       FROM base GROUP BY key),
       |${fitCte("st", "key", "n")},
       |${seasonCte("base", "key", "")},
       |r AS (SELECT b.key,
       |             SUM((b.y3 - CAST(round(icept + slope*CAST(b.x AS DOUBLE) + COALESCE(sf.sdow, 0.0)) AS BIGINT))
       |               * (b.y3 - CAST(round(icept + slope*CAST(b.x AS DOUBLE) + COALESCE(sf.sdow, 0.0)) AS BIGINT))) AS ssr
       |      FROM base b JOIN s2 ON b.key = s2.key
       |      LEFT JOIN sf ON b.key = sf.key AND isodow(b.day) = sf.dw
       |      GROUP BY b.key),
       |ci AS (SELECT s2.key, s2.n, s2.maxd, s2.maxx, s2.slope, s2.icept,
       |              CAST(round(1.96*sqrt(CAST(ssr AS DOUBLE)/CAST(s2.n AS DOUBLE))) AS BIGINT) AS ci3
       |       FROM s2 JOIN r ON s2.key = r.key),
       |fc AS (SELECT c.key, c.maxd + CAST(i AS INT) AS day,
       |              CAST(round(c.icept + c.slope*CAST(c.maxx + i AS DOUBLE) + COALESCE(sf.sdow, 0.0)) AS BIGINT) AS yhat3, c.ci3
       |       FROM ci c CROSS JOIN (SELECT UNNEST(range(1, 9)) AS i)
       |       LEFT JOIN sf ON c.key = sf.key AND isodow(c.maxd + CAST(i AS INT)) = sf.dw)""".stripMargin

  /** Shared CTE chain ending in `te` — per-(key, fold) CV test rows with
    * integer absolute errors (mirror of [[Forecaster.cvMetrics]]'s fold
    * logic). q30 aggregates it per fold; q77 pools it per key. */
  private val cvFoldCte =
    s"""$seriesCte,
       |cnt AS (SELECT key, COUNT(*) AS n FROM base GROUP BY key),
       |rn AS (SELECT b.key, b.x, b.y3, b.day,
       |              row_number() OVER (PARTITION BY b.key ORDER BY b.x) AS rn,
       |              c.n, c.n // 6 AS ts
       |       FROM base b JOIN cnt c ON b.key = c.key),
       |a AS (SELECT * FROM rn CROSS JOIN (SELECT UNNEST(range(1, 6)) AS f)),
       |tr AS (SELECT key, f, COUNT(*) AS n_train, SUM(x) AS sx, SUM(y3) AS sy,
       |              SUM(CAST(x AS BIGINT)*x) AS sxx, SUM(CAST(x AS BIGINT)*y3) AS sxy
       |       FROM a WHERE rn <= n - (6 - f)*ts GROUP BY key, f),
       |${fitCte("tr", "key, f", "n_train")},
       |${seasonCte("a", "key,f", "\n       WHERE b.rn <= b.n - (6 - b.f)*b.ts")},
       |te AS (SELECT a.key, a.f, a.y3,
       |              ABS(a.y3 - CAST(round(icept + slope*CAST(a.x AS DOUBLE) + COALESCE(sf.sdow, 0.0)) AS BIGINT)) AS abs3
       |       FROM a JOIN s2 ON a.key = s2.key AND a.f = s2.f
       |       LEFT JOIN sf ON a.key = sf.key AND a.f = sf.f AND isodow(a.day) = sf.dw
       |       WHERE a.rn > a.n - (6 - a.f)*a.ts AND a.rn <= a.n - (5 - a.f)*a.ts)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q30_cv_metrics" ->
      s"""$cvFoldCte,
         |m AS (SELECT key, f, COUNT(*) AS n_test, SUM(abs3) AS sabs, SUM(abs3*abs3) AS ssq,
         |             SUM((abs3*1000000000) // y3) AS spct,
         |             quantile_cont(abs3, 0.5) AS med
         |      FROM te GROUP BY key, f)
         |SELECT m.key, CAST(m.f AS INT) AS fold, t.n_train, m.n_test,
         | CAST(sabs AS DOUBLE)/n_test/1000.0 AS mae,
         | sqrt(CAST(ssq AS DOUBLE)/n_test)/1000.0 AS rmse,
         | CAST(spct AS DOUBLE)/n_test/1000000000.0 AS mape,
         | CAST(med AS DOUBLE)/1000.0 AS medae
         |FROM m JOIN tr t ON m.key = t.key AND m.f = t.f
         |ORDER BY 1, 2""".stripMargin,

    "q31_forecast" ->
      s"""$forecastSql
         |SELECT key, day, yhat3, yhat3 - ci3 AS lo3, yhat3 + ci3 AS hi3
         |FROM fc ORDER BY key, day""".stripMargin,

    "q32_latest_forecasts" ->
      s"""$forecastSql
         |SELECT key, day, yhat3, yhat3 - ci3 AS lo3, yhat3 + ci3 AS hi3,
         |       'graft-forecaster-'||key AS model_name, CAST(2 AS INT) AS model_version
         |FROM fc ORDER BY key, day""".stripMargin,

    // gate mirror: ssq3 <= n_test·(1000·MaxRmse)² — same integers as
    // ModelRegistry.gatePasses; rmse op order sqrt(ssq/n)/1000 identical
    "q77_model_registry" -> {
      val t2 = (MaxRmse * 1000L) * (MaxRmse * 1000L)
      s"""$cvFoldCte,
         |pooled AS (SELECT key, COUNT(*) AS n_test,
         |                  CAST(SUM(abs3*abs3) AS BIGINT) AS ssq3
         |           FROM te GROUP BY key),
         |tend AS (SELECT key, MAX(day) AS train_end FROM base GROUP BY key),
         |mrow AS (SELECT 'graft-forecaster-'||p.key AS model_name,
         |                p.n_test, p.ssq3, t.train_end,
         |                sqrt(CAST(p.ssq3 AS DOUBLE)/CAST(p.n_test AS DOUBLE))/1000.0 AS rmse,
         |                CASE WHEN p.ssq3 <= p.n_test*$t2 THEN 'production'
         |                     ELSE 'staging' END AS gate_stage
         |         FROM pooled p JOIN tend t ON p.key = t.key)
         |SELECT model_name, CAST(1 AS INT) AS version, 'archived' AS stage,
         |       n_test, ssq3, rmse, train_end FROM mrow
         |UNION ALL
         |SELECT model_name, CAST(2 AS INT) AS version, gate_stage AS stage,
         |       n_test, ssq3, rmse, train_end FROM mrow
         |ORDER BY model_name, version""".stripMargin
    },

    // From-scratch mirror of the serve-from-registry path: re-derives
    // the full-series fit (g* CTEs — fresh names; the fold-level
    // s1/s2/sd/sf inside cvFoldCte supply the gate), gates on pooled
    // ssq3, and generates the horizon with the trainer's exact op order.
    // The Spark side answers from STORED coefficients — hash equality is
    // the persistence proof.
    "q107_registry_serving" -> {
      val t2 = (MaxRmse * 1000L) * (MaxRmse * 1000L)
      s"""$cvFoldCte,
         |pooled AS (SELECT key, COUNT(*) AS n_test,
         |                  CAST(SUM(abs3*abs3) AS BIGINT) AS ssq3
         |           FROM te GROUP BY key),
         |ok AS (SELECT key FROM pooled WHERE ssq3 <= n_test*$t2),
         |fst AS (SELECT key, COUNT(*) AS n, SUM(x) AS sx, SUM(y3) AS sy,
         |               SUM(CAST(x AS BIGINT)*x) AS sxx, SUM(CAST(x AS BIGINT)*y3) AS sxy,
         |               MAX(day) AS maxd, MAX(x) AS maxx
         |        FROM base GROUP BY key),
         |g1 AS (SELECT *, CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope
         |       FROM fst WHERE n >= 2),
         |g2 AS (SELECT *, (CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS icept
         |       FROM g1),
         |gd AS (SELECT b.key, isodow(b.day) AS dw,
         |              SUM(b.y3 - CAST(round(g2.icept + g2.slope*CAST(b.x AS DOUBLE)) AS BIGINT)) AS ssum,
         |              COUNT(*) AS scnt
         |       FROM base b JOIN g2 ON b.key = g2.key GROUP BY ALL),
         |gf AS (SELECT *, CAST(ssum AS DOUBLE)/CAST(scnt AS DOUBLE) AS sdow FROM gd),
         |gr AS (SELECT b.key,
         |              SUM((b.y3 - CAST(round(g2.icept + g2.slope*CAST(b.x AS DOUBLE) + COALESCE(gf.sdow, 0.0)) AS BIGINT))
         |                * (b.y3 - CAST(round(g2.icept + g2.slope*CAST(b.x AS DOUBLE) + COALESCE(gf.sdow, 0.0)) AS BIGINT))) AS ssr
         |       FROM base b JOIN g2 ON b.key = g2.key
         |       LEFT JOIN gf ON b.key = gf.key AND isodow(b.day) = gf.dw
         |       GROUP BY b.key),
         |gci AS (SELECT g2.key, g2.maxd, g2.maxx, g2.slope, g2.icept,
         |               CAST(round(1.96*sqrt(CAST(ssr AS DOUBLE)/CAST(g2.n AS DOUBLE))) AS BIGINT) AS ci3
         |        FROM g2 JOIN gr ON g2.key = gr.key),
         |gfc AS (SELECT c.key, c.maxd + CAST(i AS INT) AS day,
         |               CAST(round(c.icept + c.slope*CAST(c.maxx + i AS DOUBLE) + COALESCE(gf.sdow, 0.0)) AS BIGINT) AS yhat3, c.ci3
         |        FROM gci c CROSS JOIN (SELECT UNNEST(range(1, 9)) AS i)
         |        LEFT JOIN gf ON c.key = gf.key AND isodow(c.maxd + CAST(i AS INT)) = gf.dw)
         |SELECT 'graft-forecaster-'||f.key AS model_name, CAST(2 AS INT) AS version,
         |       f.day, f.yhat3, f.yhat3 - f.ci3 AS lo3, f.yhat3 + f.ci3 AS hi3
         |FROM gfc f JOIN ok ON f.key = ok.key
         |ORDER BY model_name, f.day""".stripMargin
    }
  )
}
