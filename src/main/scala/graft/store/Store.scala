package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table/write layer over Parquet — the reference's Postgres DDL + sink
  * surface (SURVEY §2.1 K3/K4/K5, S4) for an engine whose tables are
  * directories of columnar files:
  *
  *  - ensureTable  ≡ Base.metadata.create_all (airflow/dags/db_utils.py:50-54)
  *  - append       ≡ df.to_sql(..., if_exists="append") (put_data_in_postgres.py:71)
  *  - overwrite    ≡ drop_all/create_all + append (put_data_in_postgres.py:61-65)
  *  - schemaOf     ≡ automap reflection (db_utils.py:71-75) — parquet
  *                   footer schema, no driver-side catalog bottleneck
  *
  * At scale: appends are per-partition parquet file adds (no shuffle, no
  * global lock); `appendPartitioned` lays data out by a partition column
  * (the reference's date-keyed sales table) so lookback filters (F3)
  * become partition pruning instead of full scans.
  */
object Store {

  /** K5 — create the table directory with an empty, schema-bearing
    * parquet file if it does not exist yet (idempotent). */
  def ensureTable(spark: SparkSession, dir: String, schema: StructType): Unit = {
    val path = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(path)) {
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .repartition(1).write.mode("overwrite").parquet(dir)
    }
  }

  /** K3 — batch append. */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** K4 — idempotent overwrite (drop-and-recreate seed semantics). */
  def overwrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** K3 at scale — append laid out by a partition column; date-range
    * queries then prune whole directories (dynamic partition pruning). */
  def appendPartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("append").partitionBy(partCol).parquet(dir)

  /** K3 at 100 TB — bucketed, sort-ordered catalog table: joins and
    * aggregations on the bucket key between co-bucketed tables need NO
    * shuffle (bucket pruning + co-located join), the cornerstone of
    * repeated big-fact-to-big-fact joins. Bucketing requires the
    * catalog (`saveAsTable`), not a bare path. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a stale warehouse directory from a previous process isn't tracked
    // by the (fresh) in-memory catalog; clear it or saveAsTable refuses
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
  }

  /** S3/K3 over an RDBMS — the reference's store is literally Postgres
    * over JDBC (spark_streaming.py:79-90 writes, training-service
    * db_utils.py:23-38 reads); the engine is parquet-native, but these
    * passthroughs keep that surface for users with an RDBMS. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** JDBC read at scale: without bounds, spark.read.jdbc is ONE executor
    * holding one connection — the classic single-reader bottleneck. This
    * overload splits `partitionCol`'s [lower, upper] range into
    * `numPartitions` concurrent range-predicate readers. */
  def readJdbc(spark: SparkSession, url: String, table: String, partitionCol: String,
               lower: Long, upper: Long, numPartitions: Int,
               props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  def writeJdbc(df: DataFrame, url: String, table: String, mode: String = "append",
                props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** S4 — schema-on-read reflection from the parquet footer. */
  def schemaOf(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(dir).schema

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
