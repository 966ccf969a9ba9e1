package graft

import org.apache.spark.sql.types._

/** The reference's entire catalog (SURVEY §1.2), declared once:
  * rossman_sales (services/data-producer/scripts/db_tables.py:9-21,
  * airflow/dags/db_utils.py:35-47, spark_streaming.py:57-70),
  * forecast_results (db_utils.py:21-32), and the Kafka JSON envelope
  * (kafka_producer.py:45-48 — 10 lowercase fields, no id).
  */
object Schemas {

  /** rossman_sales row (stateholiday normalized to string at every
    * source — the reference's mixed 0/'0'/'a'-'d' hazard,
    * kafka_producer.py:29-31). */
  case class SaleRecord(
    store: Int, dayofweek: Int, date: java.sql.Date, sales: Int,
    customers: Int, open: Int, promo: Int, stateholiday: String,
    schoolholiday: String, productname: String)

  /** forecast_results row; `id` recency is replaced by an explicit
    * model_version + created_on (parquet has no autoincrement — SURVEY
    * §7.4 risk 4, divergence documented). */
  case class ForecastResult(
    store: Int, productname: String, forecast_date: java.sql.Date,
    forecast_sale: Int, lower_ci: Int, upper_ci: Int,
    model_name: String, model_version: Int,
    created_on: java.sql.Timestamp)

  /** Kafka message envelope: the 10 sale fields, no id, all lowercase. */
  val kafkaEnvelope: StructType = StructType(Seq(
    StructField("store", IntegerType), StructField("dayofweek", IntegerType),
    StructField("date", StringType), StructField("sales", IntegerType),
    StructField("customers", IntegerType), StructField("open", IntegerType),
    StructField("promo", IntegerType), StructField("stateholiday", StringType),
    StructField("schoolholiday", StringType), StructField("productname", StringType)))

  /** Envelope of the driver-testdata `events` stream (the harness's
    * Kafka-shaped table; ts serialized as a pattern-formatted string). */
  val eventsEnvelope: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", StringType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))
}
