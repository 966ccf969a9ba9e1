package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * One place for every config that affects correctness or scale:
  *  - UTC session timezone (oracle parity; reference normalizes to UTC —
  *    services/training-service/app/db_utils.py:30).
  *  - AQE on: runtime re-planning (skew joins, partition coalescing) is the
  *    100-TB safety net for every shuffle this library emits.
  *  - shuffle partitions sized for the harness (local[32]); on a real
  *    cluster this is overridden by spark-submit conf, we only set a
  *    default that is sane for local mode (not 200).
  *  - nanosAsLong: the driver's events.parquet carries TIMESTAMP(NANOS)
  *    which Spark has no native type for; we read it as Long and convert
  *    to microsecond TimestampType in [[Tables.events]].
  */
object Engine {

  val DefaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Warehouse for bucketed/managed tables (Store.saveBucketed, q72):
    * pinned to a fresh per-JVM temp dir instead of the default
    * `$PWD/spark-warehouse`, so saveAsTable works no matter which cwd
    * the harness launches from and never litters the repo. */
  private lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft_wh").toString

  /** Apply engine config to an arbitrary builder (shared by Verify/Bench
    * mains and tests so every session behaves identically). */
  def tune(b: SparkSession.Builder, shufflePartitions: String = DefaultCpus): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffledHashJoinFactor", "3")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def session(appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$DefaultCpus]").appName(appName))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
