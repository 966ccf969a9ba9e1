package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational.{latestPerKey, topK}

/** Thin query library — the reference's service-facing read paths as
  * library calls over the Rossmann-shaped tables (SURVEY §3.3, §7.1
  * module 6). No HTTP: each former endpoint is one declarative plan.
  */
object ForecastApi {

  /** The web-UI read path (services/web-ui/app/db_utils.py:32-73):
    * F4 key filter → W1 latest-version dedup → O2 last-n forecast days,
    * re-sorted ascending for charting. `forecasts` is a
    * `forecast_results`-shaped table (Schemas.ForecastResult). */
  def latestForecasts(forecasts: DataFrame, store: Int, product: String, n: Int = 7): DataFrame = {
    val deduped = latestPerKey(
      forecasts.filter(col("store") === store && col("productname") === product),
      Seq("store", "productname", "forecast_date"), col("model_version"))
    topK(deduped, n, col("forecast_date").desc).orderBy("forecast_date")
  }

  /** Startup dropdowns (web-ui/app/main.py:38-41): distinct key sets. */
  def storeProductPairs(sales: DataFrame): DataFrame =
    sales.select("store", "productname").distinct()

  /** X12 — the reference's row→dict driver-side boundary
    * (to_dict("records"), task_operators.py:115-133). Driver-side BY
    * DESIGN: only call on small, already-reduced results (the engine
    * never collects mid-plan). */
  def collectAsMaps(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }
}
