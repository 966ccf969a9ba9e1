package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one declared query N times at a given SF dir.
  * Usage: runMain graft.TimeOne <queryName> [sfDir] [runs]
  * Honors SPARK_GRAFT_CPUS like [[Bench]]; prints per-run seconds and
  * the executed plan on request (SPARK_GRAFT_EXPLAIN=1).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Engine.tune(
      SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
