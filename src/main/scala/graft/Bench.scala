package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * emits ONE machine-readable JSON line.
  *
  * Fidelity (round-2 fixes):
  *  - each query is forced through a full materialization via a
  *    noop-format write (sink that deserializes every row) instead of
  *    `.count()`, which let Catalyst prune projection-only work and
  *    flattered the hash-heavy text queries (VERDICT r1 "what's wrong" #3);
  *  - the JSON line is printed on a bare line (build.sbt StdoutOutput —
  *    no "[info] " prefix) AND written to bench_out.json next to the
  *    repo so the driver can parse either.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.tune(
      SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    // bare line, last thing on stdout before sbt's epilogue
    println(json)
    spark.stop()
  }
}
